"""Trained character-trigram language identifier.

The stopword-profile heuristic (:func:`text_analysis.lang_id`) was the
one LLM-pipeline operator still at placeholder quality (r8 verdict
#7): distinct-stopword voting breaks on short texts, misses languages
whose function words collide (es/fr share ``de``, ``la``, ``un``) and
cannot see unsegmented scripts at all (zh has no whitespace tokens).
This module ships the TRAINED upgrade with the same mechanism the
engine already uses for learned weights (classifier_score's broadcast
integer-milli table):

- **Model**: multinomial Naive Bayes over character trigrams —
  the classic public-domain approach (Cavnar & Trenkle 1994,
  "N-Gram-Based Text Categorization"). Per (gram, lang) weight =
  round(1000·ln((count+1)/(N_lang+V))); per-lang OOV weight =
  round(1000·ln(1/(N_lang+V))). Integer milli-log-probs summed as
  longs → zero float-accumulation-order ambiguity, so a DuckDB
  oracle replays scores bit-for-bit.
- **Training data**: a small embedded corpus of original sentences in
  the 5 LANG_PROFILES languages, authored for this module from common
  public knowledge of each language (no external dataset shipped).
  Training runs deterministically at import from these literals — the
  model IS the source, no binary blob.
- **Serving plan (100 TB shape)**: lower + trigram explode (map-only
  codegen) → broadcast join on the vocabulary-sized weight table →
  ONE partial-agg'd shuffle on doc_id (pivot over the 5 known
  language codes, so no second exchange for an argmax window) →
  pure-expression argmax with ties to the lexicographically smaller
  code. Docs shorter than 3 chars → ``'und'``.

Reference parity: the reference engine has no text-analysis layer at
all (SURVEY §2.4); this extends the §2.5 LLM-pipeline surface.
"""

from __future__ import annotations

import math
from collections import Counter
from functools import lru_cache

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Original training sentences per language (authored for this module;
# everyday common-knowledge phrasing, lowercase-insensitive — training
# lowers). Kept to letters/spaces/commas/periods so the SQL-embedded
# weight literals never need quote escaping beyond the apostrophes
# handled in langid_weight_values_sql.
TRAIN_CORPUS: dict[str, list[str]] = {
    "en": [
        "the quick brown fox jumps over the lazy dog near the river bank.",
        "she said that it would be better to wait for the morning train.",
        "most people think the weather has been unusually warm this year.",
        "the children were playing in the garden behind the old house.",
        "he could not remember where he had left the keys to the car.",
        "this is one of the best books i have read in a long time.",
        "they decided to walk home because the bus was running late.",
        "there is nothing more important than the health of your family.",
        "the government announced a new plan to improve public schools.",
        "we should always try to learn something new every single day.",
        "after dinner they watched a film and talked about their plans.",
        "the museum opens early in the morning and closes after sunset.",
        "many students find it difficult to concentrate during summer.",
        "a little knowledge about history can change how you see the world.",
    ],
    "es": [
        "el perro corre por el parque mientras los ninos juegan en la arena.",
        "ella dijo que seria mejor esperar hasta la manana siguiente.",
        "la mayoria de la gente piensa que el tiempo ha sido muy caluroso.",
        "los ninos estaban jugando en el jardin detras de la casa vieja.",
        "no podia recordar donde habia dejado las llaves del coche.",
        "este es uno de los mejores libros que he leido en mucho tiempo.",
        "decidieron caminar a casa porque el autobus llegaba tarde.",
        "no hay nada mas importante que la salud de tu familia.",
        "el gobierno anuncio un nuevo plan para mejorar las escuelas.",
        "siempre debemos intentar aprender algo nuevo cada dia.",
        "despues de cenar vieron una pelicula y hablaron de sus planes.",
        "el museo abre temprano por la manana y cierra al atardecer.",
        "muchos estudiantes tienen dificultades para concentrarse en verano.",
        "un poco de conocimiento de la historia puede cambiar tu vision del mundo.",
    ],
    "fr": [
        "le chien court dans le parc pendant que les enfants jouent dehors.",
        "elle a dit qu il vaudrait mieux attendre le train du matin.",
        "la plupart des gens pensent que le temps a ete tres chaud cette annee.",
        "les enfants jouaient dans le jardin derriere la vieille maison.",
        "il ne se souvenait plus ou il avait laisse les cles de la voiture.",
        "c est un des meilleurs livres que j ai lus depuis longtemps.",
        "ils ont decide de rentrer a pied parce que le bus etait en retard.",
        "il n y a rien de plus important que la sante de votre famille.",
        "le gouvernement a annonce un nouveau plan pour les ecoles publiques.",
        "nous devrions toujours essayer d apprendre quelque chose de nouveau.",
        "apres le diner ils ont regarde un film et parle de leurs projets.",
        "le musee ouvre tot le matin et ferme apres le coucher du soleil.",
        "beaucoup d etudiants ont du mal a se concentrer pendant l ete.",
        "un peu de connaissance de l histoire peut changer votre vision du monde.",
    ],
    "de": [
        "der hund lauft durch den park wahrend die kinder im sand spielen.",
        "sie sagte dass es besser ware auf den zug am morgen zu warten.",
        "die meisten leute denken dass das wetter dieses jahr sehr warm war.",
        "die kinder spielten im garten hinter dem alten haus.",
        "er konnte sich nicht erinnern wo er die schlussel gelassen hatte.",
        "das ist eines der besten bucher die ich seit langem gelesen habe.",
        "sie beschlossen zu fuss nach hause zu gehen weil der bus zu spat kam.",
        "es gibt nichts wichtigeres als die gesundheit deiner familie.",
        "die regierung kundigte einen neuen plan fur die schulen an.",
        "wir sollten immer versuchen jeden tag etwas neues zu lernen.",
        "nach dem abendessen sahen sie einen film und sprachen uber ihre plane.",
        "das museum offnet fruh am morgen und schliesst nach sonnenuntergang.",
        "viele studenten finden es schwer sich im sommer zu konzentrieren.",
        "ein wenig wissen uber geschichte kann deine sicht auf die welt andern.",
    ],
    "zh": [
        "狗在公园里跑，孩子们在沙地上玩耍。",
        "她说最好等到明天早上再出发。",
        "大多数人认为今年的天气特别热。",
        "孩子们在老房子后面的花园里玩。",
        "他不记得把车钥匙放在哪里了。",
        "这是我很久以来读过的最好的书之一。",
        "他们决定走路回家，因为公共汽车来晚了。",
        "没有什么比家人的健康更重要。",
        "政府宣布了一项改善公立学校的新计划。",
        "我们应该每天都努力学习新的东西。",
        "晚饭后他们看了一部电影，谈论了他们的计划。",
        "博物馆早上很早开门，日落后关门。",
        "很多学生觉得夏天很难集中注意力。",
        "一点历史知识可以改变你看世界的方式。",
    ],
}

LANGS = sorted(TRAIN_CORPUS)  # de, en, es, fr, zh

# cap the shipped vocabulary per language (top-N trigrams by count,
# ties → lexicographically smaller gram) so the broadcast table and
# the oracle's VALUES literal stay bounded whatever the corpus grows to
TOP_PER_LANG = 400


def _grams(s: str) -> list[str]:
    s = s.lower()
    return [s[i : i + 3] for i in range(len(s) - 2)]


@lru_cache(maxsize=1)
def train_trigram_weights(
    top_per_lang: int = TOP_PER_LANG,
) -> tuple[tuple[tuple[str, str, int], ...], tuple[tuple[str, int], ...]]:
    """Deterministic training: returns (weights, oov) where weights =
    ((gram, lang, w_milli), ...) sorted by (lang, gram) and oov =
    ((lang, oov_milli), ...). w_milli = round(1000·ln((c+1)/(N+V))),
    oov_milli = round(1000·ln(1/(N+V))) with N = the language's kept
    gram mass and V = the shipped table's distinct gram count (the
    Laplace vocabulary)."""
    counts: dict[str, Counter] = {}
    for lang, sents in TRAIN_CORPUS.items():
        c: Counter = Counter()
        for s in sents:
            c.update(_grams(s))
        counts[lang] = c
    kept: dict[str, list[tuple[str, int]]] = {
        lang: sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:top_per_lang]
        for lang, c in counts.items()
    }
    vocab = {g for rows in kept.values() for g, _ in rows}
    v = len(vocab)
    weights: list[tuple[str, str, int]] = []
    oov: list[tuple[str, int]] = []
    for lang in LANGS:
        n = sum(cnt for _, cnt in kept[lang])
        denom = n + v
        for g, cnt in sorted(kept[lang]):
            weights.append((g, lang, round(1000 * math.log((cnt + 1) / denom))))
        oov.append((lang, round(1000 * math.log(1 / denom))))
    return tuple(weights), tuple(oov)


def langid_weights_df(spark: SparkSession) -> DataFrame:
    w, _ = train_trigram_weights()
    return spark.createDataFrame(list(w), "gram string, lang string, wm long")


def _trigrams_col(c: Column) -> Column:
    n = F.length(c) - 2
    # split-once + element_at, NOT substring(c, i, 3): UTF8String
    # substring walks from the string head (char offsets ≠ byte
    # offsets), so per-position substrings make trigram extraction
    # O(n_chars²) per doc — measured 63 s for 50k docs at sf1;
    # the char-array form is O(n_chars) and semantically identical
    # (split('', '') is per-character, same unicode units substring
    # counts). Guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather
    # than returning empty, so sub-3-char docs would grow phantom
    # grams without the WHEN.
    chars = F.split(c, "")
    return F.when(n < 1, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.concat(
                F.element_at(chars, i),
                F.element_at(chars, i + 1),
                F.element_at(chars, i + 2),
            ),
        )
    )


@lru_cache(maxsize=1)
def _weight_lut() -> tuple[dict, "object"]:
    """gram → int64[|LANGS|] milli-weight vector (OOV weights filled
    in for languages that didn't keep the gram), plus the all-OOV
    vector for unseen grams. Derived deterministically from the module
    constants, so every executor rebuilds the identical table — no
    broadcast needed."""
    import numpy as np

    weights, oov = train_trigram_weights()
    oov_m = dict(oov)
    oov_vec = np.array([oov_m[lang] for lang in LANGS], dtype=np.int64)
    lut: dict[str, object] = {}
    idx = {lang: i for i, lang in enumerate(LANGS)}
    for g, lang, wm in weights:
        v = lut.get(g)
        if v is None:
            v = oov_vec.copy()
            lut[g] = v
        v[idx[lang]] = wm
    return lut, oov_vec


def _score_text(t, lut, oov_vec) -> tuple[int, int, int]:
    """The shared model-inference kernel for BOTH Arrow passes
    (`_lang_id_trained_arrow` and `lang_id_annotate` must agree
    verdict-for-verdict — one kernel, no drift): Python str.lower,
    char-trigram counts, int64 milli-log-prob accumulation, FIRST
    index on argmax ties. Returns (n_grams, best_lang_index,
    best_milli); (0, -1, 0) for docs shorter than one trigram.

    Locale note: str.lower() is locale-independent (Unicode default
    case mapping). Spark 4's F.lower is too — UTF8String.toLowerCase
    routes non-ASCII through ICU UCharacter (root case mapping;
    verified against the bundled spark-unsafe 4.1.2 jar, which
    references com/ibm/icu/lang/UCharacter, not the JVM-default-locale
    String.toLowerCase that Spark 3 used) — so the arrow/expr/oracle
    parity does not depend on the process locale on this Spark."""
    from collections import Counter

    import numpy as np

    s = ("" if t is None else str(t)).lower()
    n = len(s) - 2
    if n < 1:
        return 0, -1, 0
    acc = np.zeros(len(LANGS), dtype=np.int64)
    for g, cnt in Counter(s[i : i + 3] for i in range(n)).items():
        acc += cnt * lut.get(g, oov_vec)
    a = int(acc.argmax())
    return n, a, int(acc[a])


def lang_id_trained(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "arrow",
) -> DataFrame:
    """(doc_id, n_grams, lang, best_milli): trained trigram-NB language
    id. Per-doc score for language L = Σ over the doc's trigram
    occurrences of (weight(g, L) if (g, L) is in the trained table
    else oov_L), all long arithmetic; lang = argmax, ties →
    lexicographically smaller code; n_grams = 0 → 'und' with
    best_milli 0.

    ``impl='arrow'`` (default): ONE mapInPandas pass — Python slicing
    + a per-executor int64 weight LUT rebuilt from the module
    constants (no broadcast, no shuffle, map-only). The expression
    twin below is the r8 dup_ngram_fraction lesson replayed: trigram
    extraction via ``transform``/``concat`` is an interpreted
    higher-order function (no codegen), measured 63 s for 50k sf1
    docs vs ~2 s for this pass; the integer score arithmetic is
    order-free, so both paths are bit-identical (tested equal, and
    the SQL oracle replays the same sums).

    ``impl='expr'``: the pure-expression parity witness — trigram
    explode → broadcast join on the ≤|LANGS|·400 row weight table →
    one partial-agg'd pivot shuffle → expression argmax.
    """
    if impl == "arrow":
        return _lang_id_trained_arrow(df, text_col, id_col)
    if impl != "expr":
        raise ValueError(f"impl must be arrow|expr, got {impl!r}")
    from .similarity import ensure_parallelism

    spark = df.sparkSession
    weights, oov = train_trigram_weights()
    wdf = F.broadcast(langid_weights_df(spark))
    c = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    # a single-file corpus scans as 1-2 splits, which would run the
    # n_chars-per-doc trigram explode + pivot partial-agg on 1-2 tasks
    # (measured: sf10 decade leg sat at ~0.3 cores before this);
    # round-robin to the session's parallelism first — no-op when the
    # scan is already split
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        F.greatest(F.length(c) - 2, F.lit(0)).cast("long").alias("_n"),
        _trigrams_col(c).alias("_grams"),
    )
    exploded = base.select(
        "doc_id", "_n", F.explode("_grams").alias("gram")
    ).join(wdf, "gram", "left")
    pivoted = (
        exploded.groupBy("doc_id", "_n")
        .pivot("lang", LANGS)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("wm").alias("ws"),
        )
    )
    oov_m = dict(oov)
    scores = {
        lang: (
            F.coalesce(F.col(f"{lang}_ws"), F.lit(0)).cast("long")
            + (F.col("_n") - F.coalesce(F.col(f"{lang}_cnt"), F.lit(0)))
            * F.lit(oov_m[lang])
        )
        for lang in LANGS
    }
    best = F.greatest(*scores.values())
    pick = F.lit("und")
    for lang in reversed(LANGS):  # earlier codes win ties
        pick = F.when(scores[lang] == best, F.lit(lang)).otherwise(pick)
    # docs with no trigrams never explode a row — restore them as 'und'
    scored = pivoted.select(
        "doc_id",
        F.col("_n").alias("n_grams"),
        pick.alias("lang"),
        best.alias("best_milli"),
    )
    missing = (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(0).cast("long").alias("n_grams"),
            F.lit("und").alias("lang"),
            F.lit(0).cast("long").alias("best_milli"),
        )
    )
    return scored.unionByName(missing)


def _lang_id_trained_arrow(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """The Arrow one-pass scorer: per doc, Counter the trigrams of the
    lowered text, accumulate the int64 weight vectors (OOV vector for
    unseen grams), argmax with first-index ties (LANGS is sorted, so
    first max IS the lexicographically smaller code)."""
    from .similarity import ensure_parallelism

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    # derive the id field's type instead of hard-coding long, so a
    # string/int id column round-trips instead of failing Arrow
    # coercion (the kmv_distinct schema-derivation pattern)
    id_type = base.schema["doc_id"].dataType.simpleString()

    def score(batches):
        import numpy as np
        import pandas as pd

        lut, oov_vec = _weight_lut()
        for pdf in batches:
            ids = pdf["doc_id"]
            n_out = np.zeros(len(pdf), dtype=np.int64)
            best = np.zeros(len(pdf), dtype=np.int64)
            langs = []
            for j, t in enumerate(pdf["_t"]):
                n, a, bm = _score_text(t, lut, oov_vec)
                if a < 0:
                    langs.append("und")
                    continue
                n_out[j] = n
                best[j] = bm
                langs.append(LANGS[a])
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_grams": n_out,
                    "lang": langs,
                    "best_milli": best,
                }
            )

    return base.mapInPandas(
        score, f"doc_id {id_type}, n_grams long, lang string, best_milli long"
    )


def lang_id_annotate(
    df: DataFrame, text_col: str = "text", out_col: str = "lang"
) -> DataFrame:
    """Append ``out_col`` (the trained-model language code) to the
    frame IN PLACE — one mapInPandas pass carrying every input column
    through, no join, no shuffle. This is the processor/streaming
    shape: annotating a stream via ``lang_id_trained`` + self-join
    would be a stream-stream join (watermark state for no reason);
    this stays map-only in both batch and streaming. An existing
    ``out_col`` column (the documents table carries a generator
    ``lang`` label) is REPLACED by the model's verdict."""
    import pyspark.sql.types as T

    if out_col in df.columns:
        df = df.drop(out_col)
    schema = T.StructType(
        list(df.schema) + [T.StructField(out_col, T.StringType())]
    )

    def annotate(batches):
        lut, oov_vec = _weight_lut()
        for pdf in batches:
            langs = []
            for t in pdf[text_col]:
                _, a, _ = _score_text(t, lut, oov_vec)
                langs.append("und" if a < 0 else LANGS[a])
            out = pdf.copy()
            out[out_col] = langs
            yield out

    return df.mapInPandas(annotate, schema)


def langid_weight_values_sql() -> str:
    """The trained table as a DuckDB VALUES literal (gram, lang, wm) —
    the oracle embeds the SAME model the engine broadcasts."""
    w, _ = train_trigram_weights()
    rows = ", ".join(
        "('" + g.replace("'", "''") + f"', '{lang}', {wm})" for g, lang, wm in w
    )
    return f"(VALUES {rows}) AS w(gram, lang, wm)"


def langid_oov_sql() -> dict[str, int]:
    _, oov = train_trigram_weights()
    return dict(oov)
