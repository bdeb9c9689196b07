"""BPE (byte-pair encoding) tokenizer training, Spark-first.

The classic Sennrich et al. (2016) trainer re-expressed for a cluster:
the CORPUS is touched exactly once (a token explode feeding a word-
frequency aggregate with map-side combine); every merge round after
that runs over the VOCABULARY table — orders of magnitude smaller than
the corpus (a 100 TB web corpus has a few tens of millions of distinct
words), which is precisely why BPE training is feasible at scale.

Per round: (1) weighted adjacent-symbol-pair counts over the vocab
(explode of ≤|word| pairs/word, map-side combined), (2) argmax pair —
count desc, then lexicographic (left, right) so ties are deterministic
— via a 1-row TakeOrdered collect, (3) a map-only regexp merge of that
pair in every word's symbol string. Left-to-right non-overlapping
regex replacement IS the BPE merge semantics ("a a a" + (a,a) → "aa
a"). The vocab frame is localCheckpointed every few rounds to keep
the lineage flat (the components/recursion house pattern).

All counting is integer arithmetic — bit-identical in any engine; the
oracle replica is plain Python over the same word frequencies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_incremental_ci_spark.operators.text import tokens


def word_freqs(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, wc) — the one corpus-sized pass."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over (sym, wc) symbol strings."""
    syms = F.split(F.trim(F.col("sym")), " ")
    # sequence(1, 0) descends in Spark — single-symbol words must map
    # to an EMPTY pair list explicitly.
    pairs = F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("left"),
                F.element_at(syms, (i + 1).cast("int")).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))
    return (
        vocab.select(F.col("wc"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.left").alias("left"), F.col("p.right").alias("right"))
        .agg(F.sum("wc").alias("pair_count"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    [(merge_rank, left, right, pair_count), …] — the merge table a
    tokenizer ships. Symbol state lives in the distributed vocab
    frame; only 1-row argmaxes ever reach the driver."""
    import re as _re

    vocab = word_freqs(df, text_col).select(
        F.concat(
            F.lit(" "),
            F.concat_ws(" ", F.split(F.col("word"), "")),
            F.lit(" "),
        ).alias("sym"),
        "wc",
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        top = (
            _pair_counts(vocab)
            .orderBy(F.desc("pair_count"), F.asc("left"), F.asc("right"))
            .limit(1)
            # driver-bound: limit(1) argmax row per merge round
            .collect()
        )
        if not top:
            break
        left, right, cnt = top[0]["left"], top[0]["right"], top[0]["pair_count"]
        merges.append((rank, left, right, int(cnt)))
        pat = "(?<= )" + _re.escape(left) + " " + _re.escape(right) + "(?= )"
        vocab = vocab.select(
            F.regexp_replace("sym", pat, left + right).alias("sym"), "wc"
        )
        if rank % checkpoint_every == 0:
            vocab = vocab.localCheckpoint(eager=False)
    return merges


def bpe_train_replica(
    word_counts: dict[str, int], n_merges: int = 10
) -> list[tuple[int, str, str, int]]:
    """Pure-Python twin of :func:`bpe_train` for oracle construction:
    same pair counting, same (count desc, pair asc) tie-break, same
    left-to-right merge application."""
    vocab = {
        tuple(word): wc for word, wc in word_counts.items() if word
    }
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for syms, wc in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + wc
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, wc in vocab.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + wc
        vocab = new_vocab
    return merges


def bpe_encode(
    text_col,
    merges: list[tuple[int, str, str, int]],
):
    """Column of BPE token arrays: apply the learned merge table to
    each whitespace word — a map-only chain of n_merges regexp
    replaces over the symbol string (no Python, no shuffle). Merge
    order matters and is the training order."""
    import re as _re

    c = F.col(text_col) if isinstance(text_col, str) else text_col

    def encode_word(w):
        s = F.concat(F.lit(" "), F.concat_ws(" ", F.split(w, "")), F.lit(" "))
        for _, left, right, _cnt in merges:
            pat = "(?<= )" + _re.escape(left) + " " + _re.escape(right) + "(?= )"
            s = F.regexp_replace(s, pat, left + right)
        return F.split(F.trim(s), " ")

    return F.flatten(F.transform(tokens(c), encode_word))
