"""Text analysis for training-data pipelines: tokenization stats, quality
scoring, language ID, document fingerprinting.

All pure Column expressions (JVM, codegen'd, no UDFs) — at 100 TB these run
map-side inside the parquet scan stage with zero shuffle.  Each helper has a
direct ANSI-SQL equivalent so the DuckDB oracle can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnOrName = Column | str


def _col(c: ColumnOrName) -> Column:
    return F.col(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

def words(text: ColumnOrName) -> Column:
    """Whitespace tokenization (collapses runs).  Empty/whitespace-only text
    yields an EMPTY array — `split('')` returns [''] which would count as one
    token and let empty documents through quality filters.

    r6 form: after ``trim``, ``split('\\s+')`` can only produce an empty
    token for the empty string (leading runs are trimmed, trailing empties
    are dropped by JDK split, interior runs collapse), so the empty-text
    case is ONE length check instead of a per-token higher-order filter
    pass — identical output, one fewer interpreted traversal everywhere
    tokenization appears."""
    t = F.trim(_col(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+"))


def token_count_ws(text: ColumnOrName) -> Column:
    """Whitespace token count."""
    return F.size(words(text))


# BPE-ish segmentation: letter runs, digit runs, punctuation runs — the
# GPT-2-style pre-tokenizer shape, kept to syntax RE2 (DuckDB) and the JDK
# regex engine (Spark) both accept, so oracles can replicate it.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"


def token_count_bpe(text: ColumnOrName) -> Column:
    """Count of BPE-ish pre-tokens (letter/digit/punct runs).

    Perf note: the pattern's negated class hits the same JDK regex slow
    path measured in ``_punct_count`` (~1 µs/char); unlike the punct
    COUNT, run-splitting genuinely needs the regex, so budget this as the
    most expensive of the token counters at corpus scale (still linear,
    map-side)."""
    return F.size(F.regexp_extract_all(_col(text), F.lit(BPE_ISH_PATTERN), 0))


# ---------------------------------------------------------------------------
# Quality scoring
# ---------------------------------------------------------------------------

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "it", "that", "this", "be",
]

#: alnum + the six ``\s`` whitespace chars — the complement of the punct class
_ALNUM_WS = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
             " \t\n\x0b\x0c\r")


def _punct_count(t: Column) -> Column:
    """Count of punctuation chars (``[^A-Za-z0-9\\s]``), computed by DELETING
    the complement via ``translate`` and measuring what is left.

    Why not ``regexp_count(t, '[^A-Za-z0-9\\s]')``: the JDK regex engine
    takes a slow path on NEGATED character classes — measured 2.4 s vs
    0.17 s for this translate form over the 10x corpus (tools/sf1_evidence
    attribution, r5); positive classes like ``[0-9]`` are fast.  The DuckDB
    oracles keep the regex form (RE2 has no such cliff) and values match.
    Caveat: for non-BMP code points ``length`` counts UTF-16 units, so an
    astral punctuation char counts 2 here vs 1 under the regex — irrelevant
    for the corpus-audit heuristic and absent from the test corpora."""
    return F.length(F.translate(t, _ALNUM_WS, ""))


def quality_features(text: ColumnOrName) -> dict[str, Column]:
    """Raw quality signals: char/word counts, mean word length, punctuation
    and digit ratios, stopword ratio.  Returned as a dict for withColumns."""
    t = _col(text)
    w = words(text)
    n_chars = F.length(t)
    n_words = F.size(w)
    stop = F.array([F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(stop, F.lower(x))))
    n_punct = _punct_count(t)
    n_digit = F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))
    # mean word length over the TRIMMED text (words() trims; untrimmed
    # n_chars would credit padding whitespace to the words).  Assumes
    # single-space separation between the n_words tokens.
    n_chars_trim = F.length(F.trim(t))
    return {
        "n_chars": n_chars,
        "n_words": n_words,
        "mean_word_len": F.round((n_chars_trim - n_words + 1) / n_words, 4),
        "punct_ratio": F.round(n_punct / n_chars, 4),
        "digit_ratio": F.round(n_digit / n_chars, 4),
        "stopword_ratio": F.round(n_stop / n_words, 4),
    }


def quality_score(text: ColumnOrName) -> Column:
    """Composite [0,1] quality heuristic: rewards mid-length documents and
    stopword presence, penalizes punctuation/digit noise.  A Gopher-rules-like
    filter reduced to deterministic arithmetic."""
    f = quality_features(text)
    len_score = F.least(f["n_words"] / 50.0, F.lit(1.0))
    stop_score = F.least(f["stopword_ratio"] * 5.0, F.lit(1.0))
    noise_pen = F.greatest(F.lit(0.0), F.lit(1.0) - f["punct_ratio"] * 3.0 - f["digit_ratio"] * 2.0)
    return F.round((len_score * 0.4 + stop_score * 0.3 + noise_pen * 0.3), 4)


def _digit_count(t: Column) -> Column:
    """Digit-char count.  Positive-class regex, NOT translate-deletion: the
    JDK slow path the ``_punct_count`` translate trick dodges is specific
    to NEGATED classes — for ``[0-9]`` the regex scan is fast and the
    translate form (which copies the string) measured 3× SLOWER at sf1.0
    (0.21 vs 0.62 s; r6 A/B)."""
    return F.size(F.regexp_extract_all(t, F.lit(r"[0-9]"), 0))


def _wc_stop_agg(w: Column, finish) -> Column:
    """(token count, stopword count) over a token array, reduced by
    ``finish(n, s)``.  Pass an already-evaluated array (lambda variable /
    materialized column) so the references share one tokenization.

    NB a struct-accumulator ``aggregate`` single-pass form was measured and
    REJECTED (r6): per-token struct allocation in interpreted eval costs
    more than the extra cheap array traversals — 2.4 → 4.8 s on the
    text_quality gate at sf1.0; size() + one filter pass is the fast shape."""
    stop = F.array([F.lit(s) for s in EN_STOPWORDS])
    n = F.size(w).cast("long")
    s = F.size(F.filter(w, lambda x: F.array_contains(stop, F.lower(x)))).cast("long")
    return finish(n, s)


def quality_features_bp(text: ColumnOrName,
                        words_arr: Column | None = None) -> dict[str, Column]:
    """Engine-portable integer variant: ratios in basis points (1/10000) via
    exact integer arithmetic — ``floor(a*10000 / b)`` with operands < 2^53 is
    bit-exact in every engine, unlike ``round(double, 4)`` whose half-way
    behaviour differs between Spark (HALF_UP on the binary double) and e.g.
    DuckDB (scaled multiply-round).  Use these for cross-engine comparisons.

    Digit counting is translate-deletion, not regex.  ``words_arr``:
    already-evaluated token array (see repetition_signals_bp) so every
    entry shares ONE tokenization."""
    t = _col(text)
    w = words_arr if words_arr is not None else words(text)
    n_chars = F.length(t).cast("long")
    n_punct = _punct_count(t).cast("long")
    n_digit = _digit_count(t).cast("long")
    return {
        "n_chars": n_chars,
        "n_words": F.size(w).cast("long"),
        "punct_bp": F.floor(n_punct * 10000 / n_chars).cast("long"),
        "digit_bp": F.floor(n_digit * 10000 / n_chars).cast("long"),
        "stopword_bp": _wc_stop_agg(
            w, lambda n, s: F.floor(s * 10000 / n).cast("long")),
    }


def _word_ngrams(word_arr: Column, n: int) -> Column:
    """Order-preserving word n-grams (duplicates kept — repetition metrics
    need multiplicities, unlike the dedup shingles)."""
    idx = F.sequence(F.lit(0), F.size(word_arr) - n)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(word_arr, i + 1, n)))
    return F.when(F.size(word_arr) >= n, grams).otherwise(
        F.array().cast("array<string>"))


# Rewrites of the n-gram legs over 64-bit gram hashes were measured and
# REJECTED (r5 outlier attribution): higher-order array expressions
# (transform/aggregate/filter) are evaluated INTERPRETED in Spark — not
# whole-stage-codegen'd — so per-element cost dominates regardless of the
# element type, and an xxhash64-of-elements lambda was 4.5× SLOWER than the
# concat_ws string form (26.3 vs 5.8 s over the 10× corpus), with
# hash-after-concat exactly neutral (5.7 s).  The signals are linear in
# tokens; the scale lever is parallelism (see q_text_repetition's widen),
# not the element representation.


def repetition_signals_bp(text: ColumnOrName | None,
                          words_arr: Column | None = None) -> dict[str, Column]:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1 quality
    filters), token-level, in integer basis points for cross-engine
    bit-exactness (same rationale as quality_features_bp):

    - ``dup_word_bp``: fraction of tokens that are repeats of an earlier
      token, ``(n - n_distinct) / n``;
    - ``top2_bp``: fraction of tokens covered by the single most frequent
      word bigram, ``min(2·max_count / n, 1)`` (occurrences may overlap, so
      capped at 10000);
    - ``dup5_bp``: fraction of word 5-gram occurrences that are duplicates,
      ``(g - g_distinct) / g`` — the n-gram repetition family's strongest
      boilerplate detector.

    All row-local array expressions — map-side over the scan, no shuffle, no
    Python; a 100 TB corpus pays one pass.  Short docs degrade gracefully:
    no bigrams/5-grams → 0 bp (not null), so downstream filters compose.

    ``words_arr``: already-evaluated token array (e.g. a lambda variable from
    a transform-over-singleton let-binding, or a materialized column) — the
    signals then share ONE tokenization instead of re-tokenizing per entry
    (HOFs are interpreted; Catalyst does not CSE across expression roots)."""
    w = words_arr if words_arr is not None else words(text)
    n = F.size(w).cast("long")
    n_dist = F.size(F.array_distinct(w)).cast("long")
    dup_word = F.when(n > 0, F.floor((n - n_dist) * 10000 / n)).otherwise(0)

    g2 = _word_ngrams(w, 2)
    # max multiplicity via sorted run-lengths — O(W log W) per doc.  The
    # obvious transform×filter count is O(W²) AND falls out of codegen into
    # interpreted eval on real documents (observed: a single 5k-doc
    # partition pinned one core for 6+ minutes at sf0.1); the sorted
    # aggregate runs the same corpus in under a second.
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def _run_step(acc, g):
        run = F.when(acc["prev"].eqNullSafe(g), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            g.alias("prev"), run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    top2_cnt = F.aggregate(
        F.array_sort(g2), acc0, _run_step, lambda acc: acc["best"]
    ).cast("long")
    top2 = F.when(
        F.size(g2) > 0,
        F.least(F.floor(top2_cnt * 2 * 10000 / n), F.lit(10000).cast("long")),
    ).otherwise(0)

    g5 = _word_ngrams(w, 5)
    g5n = F.size(g5).cast("long")
    g5d = F.size(F.array_distinct(g5)).cast("long")
    dup5 = F.when(g5n > 0, F.floor((g5n - g5d) * 10000 / g5n)).otherwise(0)

    return {
        "dup_word_bp": dup_word.cast("long"),
        "top2_bp": top2.cast("long"),
        "dup5_bp": dup5.cast("long"),
    }


def is_repetitive(text: ColumnOrName,
                  max_dup_word_bp: int = 5000,
                  max_top2_bp: int = 2000,
                  max_dup5_bp: int = 3000,
                  min_words: int = 10) -> Column:
    """Boolean repetition filter with Gopher-shaped default thresholds
    (tuned per-corpus in practice): true when ANY signal exceeds its cap.

    ``min_words``: documents shorter than this are NEVER flagged — the
    fractions are meaningless at tiny n (a 6-word doc with zero repetition
    has top2_bp = floor(2·10000/6) = 3333 purely from its length; Gopher
    likewise applies its repetition filters only above a minimum length).
    Set 0 to disable the guard."""
    s = repetition_signals_bp(text)
    flag = ((s["dup_word_bp"] > max_dup_word_bp)
            | (s["top2_bp"] > max_top2_bp)
            | (s["dup5_bp"] > max_dup5_bp))
    if min_words > 0:
        flag = flag & (F.size(words(text)) >= min_words)
    return flag


def quality_score_bp(text: ColumnOrName,
                     words_arr: Column | None = None) -> Column:
    """Integer-exact composite quality in basis points [0, 10000]:
    0.4·len + 0.3·stopword + 0.3·(1 − noise), all in integer arithmetic.

    With ``words_arr`` bound by the caller the composite costs one size()
    and one filter pass over the shared token array plus the translate-based
    punct/digit counts — no re-tokenization anywhere."""
    t = _col(text)
    n_chars = F.length(t).cast("long")
    punct_bp = F.floor(_punct_count(t).cast("long") * 10000 / n_chars).cast("long")
    digit_bp = F.floor(_digit_count(t).cast("long") * 10000 / n_chars).cast("long")
    noise_bp = F.greatest(
        F.lit(0).cast("long"),
        F.lit(10000).cast("long") - punct_bp * 3 - digit_bp * 2,
    )

    def finish(n, s):
        len_bp = F.least(n * 200, F.lit(10000).cast("long"))
        stop_bp = F.least(
            F.floor(s * 10000 / n).cast("long") * 5,
            F.lit(10000).cast("long"))
        return F.floor((len_bp * 4 + stop_bp * 3 + noise_bp * 3) / 10).cast("long")

    return _wc_stop_agg(words_arr if words_arr is not None else words(text), finish)


# ---------------------------------------------------------------------------
# Language ID (n-gram/stopword heuristic)
# ---------------------------------------------------------------------------

LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "with", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "von"],
    "es": ["el", "la", "los", "que", "y", "es", "en", "un", "una", "por"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "que", "pour"],
    # r5 additions — marker words chosen to avoid bare one-letter tokens
    # ('a', 'o', 'e') that would misfire on English prose
    "it": ["il", "che", "di", "non", "per", "con", "una", "sono", "della", "questo"],
    "pt": ["que", "de", "não", "uma", "para", "com", "por", "mais", "como", "mas"],
    "nl": ["het", "een", "van", "niet", "met", "zijn", "voor", "maar", "ook", "naar"],
}

#: script-range signals (r5): one literal unicode character-class per
#: script, counted per CHARACTER — the same regexp_extract_all shape as the
#: original CJK rule, portable between the JDK engine and RE2/DuckDB.
SCRIPT_PATTERNS: dict[str, str] = {
    "zh": r"[一-鿿]",    # CJK unified ideographs U+4E00-9FFF
    "ja": r"[ぁ-ヿ]",    # hiragana + katakana U+3041-30FF
    "ko": r"[가-힣]",    # hangul syllables U+AC00-D7A3
    "ru": r"[Ѐ-ӿ]",     # cyrillic U+0400-04FF
    "ar": r"[؀-ۿ]",     # arabic U+0600-06FF
    "hi": r"[ऀ-ॿ]",     # devanagari U+0900-097F
}

#: kept for callers/tests of the r2-r4 surface
CJK_PATTERN = SCRIPT_PATTERNS["zh"]


def lang_scores(text: ColumnOrName) -> dict[str, Column]:
    """Per-language scores: marker-word hit counts for the Latin-script
    languages, per-character script-range counts for zh/ja/ko/ru/ar/hi.
    Everything is a pure Column (filter over the shared tokenization +
    regexp_extract_all) — map-side, no shuffle, oracle-replicable."""
    w = words(text)
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        marker_arr = F.array([F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(w, lambda x: F.array_contains(marker_arr, F.lower(x))))
    for lang, pat in SCRIPT_PATTERNS.items():
        out[lang] = F.size(F.regexp_extract_all(_col(text), F.lit(pat), 0))
    return out


def lang_id(text: ColumnOrName, default: str = "unknown",
            words_arr: Column | None = None) -> Column:
    """argmax language by marker score; deterministic tie-break = language
    code order; 'unknown' when every score is 0.

    Implementation notes:

    - (r5) the obvious argmax fold doubles the expression tree per language
      (measured 20x at 13 languages); max over an array of (score, -index)
      structs evaluates each score once — FIRST code in sorted order wins
      ties, matching the DuckDB oracle's CASE order.
    - (r6) the seven Latin marker scores share ONE lowered tokenization,
      bound once as a transform-over-singleton lambda variable — the r5
      shape ran ``size(filter(words(text)))`` per language, and because
      higher-order functions are interpreted and Catalyst does not CSE
      across expression roots, that re-tokenized the text seven times.
      (A struct-accumulator single-traversal aggregate was measured and
      REJECTED: per-token struct/array allocation in interpreted eval loses
      to seven plain filter passes over the bound array, 4.8 vs 3.9 s on
      the gate.)  Script scores use ``regexp_count`` (no match-array
      materialization).  The final when/element_at is wrapped in the same
      binding trick so the argmax struct is evaluated ONCE, not once per
      reference.  Values are bit-identical to r5 (same counts, same
      tie-break).

    ``words_arr``: already-evaluated token array (e.g. an outer lambda
    variable) to share the tokenization with other annotators."""
    t = _col(text)
    langs = sorted(list(LANG_MARKERS) + list(SCRIPT_PATTERNS))
    codes = F.array(*[F.lit(lang) for lang in langs])

    def build(lw):
        entries = []
        for lang in langs:
            if lang in LANG_MARKERS:
                arr = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
                s = F.size(F.filter(lw, lambda x: F.array_contains(arr, x)))
            else:
                s = F.regexp_count(t, F.lit(SCRIPT_PATTERNS[lang]))
            entries.append(F.struct(s.cast("int").alias("s"),
                                    F.lit(-langs.index(lang)).cast("int").alias("ni")))
        return F.array_max(F.array(*entries))

    w = words_arr if words_arr is not None else words(t)
    best = F.element_at(
        F.transform(F.array(F.transform(w, lambda x: F.lower(x))), build), 1)
    return F.element_at(
        F.transform(
            F.array(best),
            lambda b: F.when(b["s"] > 0, F.element_at(codes, -b["ni"] + 1))
                       .otherwise(F.lit(default)),
        ),
        1,
    )


#: three deterministic sample sentences per language — the driver gate
#: unions these with the (en/zh-only) synthetic corpus so EVERY marker list
#: and script range is exercised cross-engine, not just the two the corpus
#: happens to contain
_LANG_SAMPLES: dict[str, list[str]] = {
    "en": ["the cat and the dog sit in the garden for it is warm",
           "this is the house that jack built with all of it",
           "to be or not to be that is the question for the ages"],
    "de": ["der hund ist nicht mit der katze und der maus im haus",
           "das wetter ist heute schön und wir gehen zu dem park von hier",
           "ein mann und eine frau sind mit dem zug von berlin gekommen"],
    "es": ["el perro y la gata es en la casa por un dia entero",
           "los niños que juegan en el parque son muy felices y ruidosos",
           "es una historia que el pueblo cuenta por la noche"],
    "fr": ["le chien est dans les jardins pour une promenade et le chat",
           "la vie est belle et les gens sont heureux dans que pour",
           "une baguette et un café dans le matin est que pour les parisiens"],
    "it": ["il cane non è che un animale di casa per questo sono contento",
           "la vita è bella e di questo non si può che essere felici con una risata",
           "sono andato con il treno di roma per non perdere questo giorno"],
    "pt": ["o cão não é mais que um animal de casa para quem gosta como eu mas",
           "a vida é boa para quem sabe viver como se deve mas não mais que isso",
           "de manhã como pão com café para começar mais um dia como sempre"],
    "nl": ["het is een hond die niet met de kat wil spelen maar ook niet weg wil",
           "een fiets is voor veel mensen niet alleen vervoer maar ook plezier naar huis",
           "wij zijn met zijn allen naar het strand gegaan maar ook voor het eten"],
    "zh": ["今天天气很好我们去公园散步", "他们在学校学习中文和数学", "这本书的内容非常有意思"],
    "ja": ["きょうは天気がいいので公園へさんぽに行きます", "わたしはにほんごをべんきょうしています",
           "このほんはとてもおもしろいです"],
    "ko": ["오늘 날씨가 좋아서 우리는 공원에 갑니다", "저는 한국어를 공부하고 있습니다",
           "이 책은 정말 재미있습니다"],
    "ru": ["сегодня хорошая погода и мы идём гулять в парк", "я изучаю русский язык уже два года",
           "эта книга очень интересная и полезная"],
    "ar": ["الطقس جميل اليوم ونحن ذاهبون إلى الحديقة", "أنا أدرس اللغة العربية منذ سنتين",
           "هذا الكتاب مفيد وممتع جدا"],
    "hi": ["आज मौसम अच्छा है और हम पार्क जा रहे हैं", "मैं दो साल से हिंदी सीख रहा हूँ",
           "यह किताब बहुत रोचक और उपयोगी है"],
}


def write_lang_fixture(path: str) -> str:
    """Idempotent pyarrow write of the multilingual sample docs
    (``_LANG_SAMPLES``): columns (doc_id, lang_true, text), doc_id dense in
    sample order — deterministic, no randomness."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    rows = []
    for lang in sorted(_LANG_SAMPLES):
        for s in _LANG_SAMPLES[lang]:
            rows.append({"doc_id": len(rows), "lang_true": lang, "text": s})
    tbl = pa.Table.from_pylist(rows, schema=pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("lang_true", pa.string()),
         pa.field("text", pa.string())]))
    pq.write_table(tbl, path)
    return path


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------

def content_fingerprint(text: ColumnOrName) -> Column:
    """Deterministic content fingerprint: md5 of the whitespace-normalized,
    lower-cased text — the exact-dedup key (md5 exists in every engine, so
    oracles replicate it)."""
    norm = F.lower(F.regexp_replace(F.trim(_col(text)), r"\s+", " "))
    return F.md5(norm)


def rolling_fingerprint(text: ColumnOrName, n: int = 3) -> Column:
    """64-bit rolling fingerprint: min xxhash64 over word n-gram shingles —
    an order-sensitive near-dup key (Spark-native; no SQL oracle)."""
    from feathr_online_spark.operators.dedup import shingles

    return F.array_min(F.transform(shingles(words(text), n), lambda s: F.xxhash64(s)))
