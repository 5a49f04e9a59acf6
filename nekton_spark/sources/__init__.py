from . import files, stdin, kafka, http  # noqa: F401  (register type tags)
