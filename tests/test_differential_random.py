"""Seeded-random differential tests: Spark operators vs independent
pure-Python reference implementations on generated data.

The oracle SQL proves cross-engine agreement on the fixture corpus;
these prove agreement with a THIRD, loop-style implementation on
randomized inputs (seeded — failures reproduce), covering shapes the
fixtures may not contain (ties, bursts, empty groups, extreme values).
One Spark job per test: the whole random dataset goes through in a
single DataFrame, so hypothesis-style per-example jobs are avoided.
"""

from __future__ import annotations

import random

import pyspark.sql.functions as F

SEED = 20260813


def test_funnel_matches_python_simulation(spark):
    from parallel_map_reduce_spark.operators.funnel import funnel_first_completion

    rng = random.Random(SEED)
    types = ["view", "click", "purchase", "error", "signup"]
    rows = []
    for i in range(3000):
        user = rng.randint(1, 60)  # dense users → plenty of ties/bursts
        ts_us = rng.randint(0, 500) * 1_000_000  # coarse → many equal ts
        rows.append((i, user, ts_us, rng.choice(types)))

    # pure-Python reference: sort by (ts, step_rank) per user, run the
    # state machine
    rank = {"view": 0, "click": 1, "purchase": 2}
    by_user: dict[int, list[tuple[int, int]]] = {}
    for _eid, u, ts, et in rows:
        if et in rank:
            by_user.setdefault(u, []).append((ts, rank[et]))
    want = {}
    for u, evs in by_user.items():
        st = [None, None, None]
        for ts, rk in sorted(evs):
            if rk == 0 and st[0] is None:
                st[0] = ts
            elif rk == 1 and st[1] is None and st[0] is not None:
                st[1] = ts
            elif rk == 2 and st[2] is None and st[1] is not None:
                st[2] = ts
        if st[2] is not None:
            want[u] = tuple(st)

    df = spark.createDataFrame(
        [(e, u, ts, et) for e, u, ts, et in rows],
        "event_id LONG, user_id LONG, ts_us LONG, event_type STRING",
    ).withColumn("ts", F.timestamp_micros("ts_us"))
    got = {
        r.user_id: (r.view_ts_us, r.click_ts_us, r.purchase_ts_us)
        for r in funnel_first_completion(df).collect()
    }
    assert got == want


def test_morton_matches_python_interleave(spark):
    from parallel_map_reduce_spark.operators.layout import morton_code

    rng = random.Random(SEED)
    pairs = [(rng.randint(0, 65535), rng.randint(0, 65535)) for _ in range(500)]
    pairs += [(0, 0), (65535, 65535), (0, 65535), (65535, 0), (1, 2)]

    def py_morton(a: int, b: int) -> int:
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(pairs, "a LONG, b LONG")
    got = {
        (r.a, r.b): r.z
        for r in df.withColumn("z", morton_code(F.col("a"), F.col("b"))).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == py_morton(a, b), (a, b)


def test_global_ntile_matches_python_on_random(spark):
    from parallel_map_reduce_spark.operators.ranking import global_ntile

    rng = random.Random(SEED)
    # heavy ties: values drawn from a tiny domain
    vals = [(i, rng.randint(0, 20)) for i in range(2000)]
    df = spark.createDataFrame(vals, "id LONG, v LONG")
    k = 7
    got = {r.id: r.t for r in global_ntile(df, ["v", "id"], k, out_col="t").collect()}

    order = sorted(vals, key=lambda x: (x[1], x[0]))
    n = len(order)
    q, r = divmod(n, k)
    want = {}
    pos = 0
    for tile in range(1, k + 1):
        size = q + (1 if tile <= r else 0)
        for _ in range(size):
            want[order[pos][0]] = tile
            pos += 1
    assert got == want


def _random_docs(rng, n_docs, vocab, min_len=0, max_len=40, phrases=None):
    """Random word documents; optional shared multi-word phrases injected
    to force cross-document duplicate windows."""
    docs = []
    for d in range(1, n_docs + 1):
        toks = [rng.choice(vocab) for _ in range(rng.randint(min_len, max_len))]
        if phrases and rng.random() < 0.5:
            ph = rng.choice(phrases)
            pos = rng.randint(0, len(toks))
            toks = toks[:pos] + ph + toks[pos:]
        docs.append((d, " ".join(toks)))
    return docs


def test_chunker_matches_python_loop(spark):
    """chunk_documents vs a plain-Python sliding-window loop on random
    docs (lengths straddling w, multiples of stride, empty docs), plus
    the reconstruction invariant: dropping each later chunk's overlap
    prefix and concatenating rebuilds the document."""
    from parallel_map_reduce_spark.operators.text_analysis import chunk_documents

    rng = random.Random(SEED + 1)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    w, s = 6, 4
    docs = _random_docs(rng, 120, vocab, min_len=0, max_len=20)
    import math

    want = {}
    for d, text in docs:
        toks = text.split()
        if not toks:
            continue
        n_chunks = 1 + math.ceil(max(len(toks) - w, 0) / s)
        want[d] = [toks[k * s : k * s + w] for k in range(n_chunks)]
    got = {}
    out = chunk_documents(
        spark.createDataFrame(docs, ["doc_id", "text"]), w=w, stride=s
    ).collect()
    for r in out:
        got.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk_text.split()
    for d, chunks in want.items():
        gc = [got[d][k] for k in sorted(got[d])]
        assert gc == chunks, (d, gc, chunks)
        rebuilt = list(gc[0]) if gc else []
        for later in gc[1:]:
            rebuilt.extend(later[w - s :])
        orig = docs[d - 1][1].split()
        assert rebuilt == orig, (d, rebuilt, orig)
    assert set(got) == set(want)


def test_passage_dedup_clean_matches_python_loop(spark):
    """passage_dedup_clean vs a Python reference on random docs with
    injected shared phrases (guaranteed cross-doc duplicate windows)."""
    from parallel_map_reduce_spark.operators.dedup import passage_dedup_clean

    rng = random.Random(SEED + 2)
    vocab = ["ada", "bee", "cat", "doe", "elk", "fox", "gnu", "hen"]
    w = 4
    phrases = [["dup"] * w, ["rep", "rep", "rep", "rep"]]
    docs = _random_docs(rng, 80, vocab, min_len=0, max_len=18, phrases=phrases)

    windows = {}
    for d, text in docs:
        toks = text.split()
        windows[d] = [
            toks[i * w : (i + 1) * w] for i in range(len(toks) // w)
        ]
    from collections import defaultdict

    seen_in = defaultdict(set)
    for d, ws_ in windows.items():
        for ch in ws_:
            seen_in[" ".join(ch)].add(d)
    want = {}
    for d, text in docs:
        toks = text.split()
        kept = [ch for ch in windows[d] if len(seen_in[" ".join(ch)]) == 1]
        tail = toks[(len(toks) // w) * w :]
        clean = " ".join([t for ch in kept for t in ch] + tail)
        want[d] = (clean, len(kept), len(windows[d]) - len(kept))
    out = passage_dedup_clean(
        spark.createDataFrame(docs, ["doc_id", "text"]), w=w
    ).collect()
    got = {r.doc_id: (r.clean_text, r.n_kept, r.n_removed) for r in out}
    assert got == want


def test_vocab_growth_matches_python_loop(spark):
    """vocab_growth vs a Python running-set loop on random docs
    (including empty docs and repeated words)."""
    from parallel_map_reduce_spark.operators.text_analysis import vocab_growth

    rng = random.Random(SEED + 3)
    vocab = [f"w{chr(97 + i)}" for i in range(12)]
    docs = _random_docs(rng, 100, vocab, min_len=0, max_len=15)
    seen = set()
    cum_tok = 0
    want = {}
    for d, text in docs:
        toks = text.split()
        cum_tok += len(toks)
        seen.update(toks)
        want[d] = (cum_tok, len(seen))
    out = vocab_growth(spark.createDataFrame(docs, ["doc_id", "text"])).collect()
    got = {r.doc_id: (r.cum_tokens, r.vocab_size) for r in out}
    assert got == want
