"""BPE trainer/encoder vs a pure-Python reference implementation of
Sennrich et al. 2016 — the registry-external verification path for an
iterative operator whose multi-step merge sequence is not expressible
as one oracle SQL string (the single-step statistic IS oracle-backed:
`text_bpe_pairs`).
"""
from __future__ import annotations

from collections import Counter

from conftest import SF_CORRECT, SF_SMOKE

from go_mailio_diskusage_handler_spark.operators import text as T
from go_mailio_diskusage_handler_spark.sources.tables import load_table


# --- pure-Python reference (the paper's algorithm, frequency table form)


def _ref_train(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    words = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            cnt = vocab[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # tie-break: count DESC, then (left, right) ASC — the Spark
        # trainer's deterministic order
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        for w, syms in words.items():
            out: list[str] = []
            for x in syms:
                if out and out[-1] == best[0] and x == best[1]:
                    out[-1] = out[-1] + x
                else:
                    out.append(x)
            words[w] = out
    return merges


def _ref_encode(word: str, merges: list[tuple[str, str]]) -> list[str]:
    rank = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) > 1:
        cand = [
            (rank[(a, b)], i)
            for i, (a, b) in enumerate(zip(syms, syms[1:]))
            if (a, b) in rank
        ]
        if not cand:
            break
        _, i = min(cand)
        syms[i : i + 2] = [syms[i] + syms[i + 1]]
    return syms


def test_bpe_train_matches_reference_on_fixture(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = [r.text for r in docs.select("text").collect()]
    got = T.bpe_train(docs, n_merges=6)
    want = _ref_train(texts, 6)
    assert got == want


def test_bpe_train_is_partitioning_invariant(spark):
    """The merge sequence must not depend on partition count — the
    local[32] vs 1000-executor axis."""
    docs = load_table(spark, SF_SMOKE, "documents")
    assert T.bpe_train(docs.repartition(1), 4) == T.bpe_train(
        docs.repartition(13), 4
    )


def test_bpe_encode_matches_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    texts = {r.doc_id: r.text for r in docs.collect()}
    merges = T.bpe_train(docs, n_merges=6)
    got = {
        r.doc_id: (r.n_bpe_tokens, r.n_distinct_bpe_tokens)
        for r in T.bpe_encode(docs, merges).collect()
    }
    for doc_id, txt in texts.items():
        toks: list[str] = []
        for w in txt.split(" "):
            if w:
                toks.extend(_ref_encode(w, merges))
        assert got[doc_id] == (len(toks), len(set(toks)))


def test_bpe_merge_fold_handles_repeats_and_overlaps(spark):
    """The JVM fold must be greedy left-to-right NON-overlapping:
    (a,a) over 'aaa' gives [aa, a], never [aa, aa] or [a, aa]."""
    df = spark.createDataFrame([("aaa bab abab",)], "text string")
    merges = T.bpe_train(df, n_merges=1)
    # pairs weighted: 'aaa' has (a,a)x2; 'bab' (b,a),(a,b); 'abab'
    # (a,b)x2,(b,a) -> (a,b) count 3 wins
    assert merges == [("a", "b")]
    enc = {r.doc_id: r.n_bpe_tokens for r in T.bpe_encode(
        df.selectExpr("1 as doc_id", "text"), merges
    ).collect()}
    # aaa -> a,a,a (3) ; bab -> b,ab (2) ; abab -> ab,ab (2)
    assert enc == {1: 7}


def test_bpe_encoder_compresses_the_corpus(spark):
    """More merges, fewer tokens — the monotone signal tokenizer evals
    read; checked at the oracle scale."""
    docs = load_table(spark, SF_CORRECT, "documents")
    m8 = T.bpe_train(docs, n_merges=8)
    n0 = T.bpe_encode(docs, []).agg({"n_bpe_tokens": "sum"}).first()[0]
    n8 = T.bpe_encode(docs, m8).agg({"n_bpe_tokens": "sum"}).first()[0]
    assert n8 < n0


def test_barrier_map_in_pandas_surface(spark):
    """``mapInPandas(..., barrier=True)`` — the barrier execution mode
    distributed-training launchers (all-gather embedding jobs, NCCL
    init) rely on: every task starts together and can see the full
    task group via BarrierTaskContext.  Locally we pin the surface:
    the barrier stage runs, each task reports the SAME task-group size
    through the context, and results match the non-barrier twin.
    Barrier mode requires #partitions <= available slots, so the input
    is coalesced to 4."""
    import pandas as pd

    def agg_with_ctx(batches):
        from pyspark import BarrierTaskContext

        ctx = BarrierTaskContext.get()
        n = 0
        for pdf in batches:
            n += len(pdf)
        yield pd.DataFrame(
            {"rows": [n], "world_size": [len(ctx.getTaskInfos())]}
        )

    df = spark.range(0, 1000).repartition(4)
    out = df.mapInPandas(
        agg_with_ctx, "rows long, world_size int", barrier=True
    ).collect()
    assert sum(r.rows for r in out) == 1000
    assert {r.world_size for r in out} == {4}


def test_bpe_train_handles_astral_code_points(spark):
    """Symbols must be Unicode CODE POINTS, not UTF-16 code units: an
    emoji (astral plane) is ONE symbol on both the Spark and the
    Python side — a position-regex split would shear it into two lone
    surrogates and learn merges bpe_encode's list(w) could never
    match."""
    texts = ["a\U0001F600b a\U0001F600b ab", "\U0001F600\U0001F600 ab ab"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = T.bpe_train(df, n_merges=3)
    want = _ref_train(texts, 3)
    assert got == want
    enc = T.bpe_encode(
        df.selectExpr("monotonically_increasing_id() as doc_id", "text"), got
    ).collect()
    for r, t in zip(sorted(enc, key=lambda r: r.doc_id), texts):
        toks = []
        for w in t.split(" "):
            if w:
                toks.extend(_ref_encode(w, got))
        assert (r.n_bpe_tokens, r.n_distinct_bpe_tokens) == (
            len(toks), len(set(toks))
        )
