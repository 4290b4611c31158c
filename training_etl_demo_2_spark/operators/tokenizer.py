"""BPE tokenizer training + application — the tokenizer stage of an
LLM data pipeline, Spark-first.

Training follows the classic byte-pair-encoding recipe (Sennrich et
al. 2016; the HF/SentencePiece shape): merge rules are learned from the
WORD-FREQUENCY table, not the raw corpus. That factorization is the
whole scale story — the corpus-sized work is one distributed
``groupBy(word).count()`` (the word_count plan, partial aggs + one
shuffle), after which the vocabulary (≪ corpus; bounded by distinct
words) is collected and the greedy merge loop runs driver-side exactly
as every production tokenizer trainer does. Application is distributed
again: the learned merge table ships in the task closure and each doc
is tokenized in Arrow-batched ``mapInPandas``.

Determinism: merge selection ties break on the lexicographically
smallest pair, so the same corpus always yields the same merge table
on any cluster layout. The gate runs a FULL DuckDB twin
(oracle_text.bpe_token_counts_sql): the fixed merge count lets the
trainer unroll as chained CTEs, and rank-order replace application
equals the lowest-rank-first encoder because a merge's symbols always
predate it; invariants are additionally pytest-pinned.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"
DEFAULT_MERGES = 30
# Collect floor: a web-scale corpus's RAW vocabulary is itself huge
# (long-tail typos, hashes, URLs), so the driver collect is bounded by
# dropping words under min_count — the standard trainer threshold
# (SentencePiece/HF expose the same knob). 1 keeps fixture behaviour
# identical; production sets it >= 2 so the collect shrinks from
# O(distinct words) to O(words seen min_count+ times), and the dropped
# singleton tail could only have influenced merges past the head pairs.
DEFAULT_MIN_COUNT = 1


def _word_counts(
    df: DataFrame, text_col: str, min_count: int = DEFAULT_MIN_COUNT
) -> list[tuple[str, int]]:
    """Distributed (word, count), floored at min_count — the only
    corpus-sized pass, and the floor is what bounds the collect."""
    rows = (
        df.select(F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .collect()
    )
    return [(r.w, int(r.cnt)) for r in rows]


def train_bpe(
    df: DataFrame,
    n_merges: int = DEFAULT_MERGES,
    text_col: str = "text",
    min_count: int = DEFAULT_MIN_COUNT,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from the corpus.

    Words are symbol sequences (chars + a ``</w>`` terminator so
    merges cannot cross word boundaries); each round merges the
    most-frequent adjacent symbol pair (ties -> lexicographically
    smallest pair). Runs on the collected word-frequency table —
    vocabulary-sized and ``min_count``-floored, the standard trainer
    design."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in _word_counts(df, text_col, min_count):
        vocab[tuple(w) + (END_OF_WORD,)] = (
            vocab.get(tuple(w) + (END_OF_WORD,), 0) + c
        )
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, cnt in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += cnt
        if not pairs:
            break
        best_cnt = max(pairs.values())
        best = min(p for p, c in pairs.items() if c == best_cnt)
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, cnt in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if (
                    i < len(sym) - 1
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + cnt
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END_OF_WORD]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    n_merges: int = DEFAULT_MERGES,
    text_col: str = "text",
    min_count: int = DEFAULT_MIN_COUNT,
) -> DataFrame:
    """Corpus BPE token frequencies: (token, cnt) after applying the
    learned merge table, lowest-rank merge first per word (the standard
    BPE encoder). The merge table ships in the closure (tiny); encoding
    is an Arrow-batched narrow pass + one shuffle on the token key —
    the word_count plan over learned subword units.

    ``min_count`` floors the TRAINER's vocabulary collect (the
    production profile — see DEFAULT_MIN_COUNT); the ENCODER always
    runs over the full corpus, so floored-out singleton words still
    tokenize via the merges the head of the distribution learned."""
    if merges is None:
        merges = train_bpe(df, n_merges, text_col, min_count)
    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = "token string, n long"

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[str]] = {}
        for pdf in batches:
            counts: Counter = Counter()
            for text in pdf["text"]:
                for w in str(text).lower().split(" "):
                    if not w:
                        continue
                    toks = cache.get(w)
                    if toks is None:
                        toks = _encode_word(w, ranks)
                        cache[w] = toks
                    counts.update(toks)
            if counts:
                yield pd.DataFrame(
                    {"token": list(counts), "n": list(counts.values())}
                )

    return (
        df.select(F.col(text_col).alias("text"))
        .mapInPandas(encode, out_schema)
        .groupBy("token")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )


def bpe_fertility_by_lang(
    df: DataFrame,
    merges: list[tuple[str, str]] | None = None,
    n_merges: int = DEFAULT_MERGES,
    text_col: str = "text",
    lang_col: str = "lang",
    min_count: int = DEFAULT_MIN_COUNT,
) -> DataFrame:
    """Tokenizer FERTILITY per language — tokens/word and chars/token,
    the standard diagnostic for how well one shared vocabulary serves a
    multilingual corpus (a language the merges under-serve fragments
    into near-character tokens: fertility ↑, chars/token ↓ — it pays
    more context budget per word, the classic under-tokenization tax).

    Same factorization as bpe_token_counts: merges train once on the
    corpus word table (bounded driver collect), then one narrow
    Arrow-batched pass encodes docs with the rank table in the closure
    and folds per-language integer sums (words, BPE tokens, chars of
    lowercased words); one ≤|langs| groupBy finishes. All three sums
    are exact integers; the two ratios divide once per language through
    the shared double sequence.
    """
    if merges is None:
        merges = train_bpe(df, n_merges, text_col, min_count)
    ranks = {p: i for i, p in enumerate(merges)}

    def fold(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, int] = {}
        for pdf in batches:
            words: Counter = Counter()
            toks: Counter = Counter()
            chars: Counter = Counter()
            for lang, text in zip(pdf["lang"], pdf["text"]):
                for w in str(text).lower().split(" "):
                    if not w:
                        continue
                    nt = cache.get(w)
                    if nt is None:
                        nt = len(_encode_word(w, ranks))
                        cache[w] = nt
                    words[lang] += 1
                    toks[lang] += nt
                    chars[lang] += len(w)
            if words:
                yield pd.DataFrame(
                    {
                        "lang": list(words),
                        "n_words": [words[g] for g in words],
                        "n_tokens": [toks[g] for g in words],
                        "n_chars": [chars[g] for g in words],
                    }
                )

    agg = (
        df.select(F.col(lang_col).alias("lang"), F.col(text_col).alias("text"))
        .mapInPandas(fold, "lang string, n_words long, n_tokens long, n_chars long")
        .groupBy("lang")
        .agg(
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
        )
    )
    d = lambda c: F.col(c).cast("double")
    return agg.select(
        "lang",
        "n_words",
        "n_tokens",
        "n_chars",
        F.round(d("n_tokens") / d("n_words"), 6).alias("fertility_r6"),
        F.round(d("n_chars") / d("n_tokens"), 6).alias("chars_per_token_r6"),
    )
