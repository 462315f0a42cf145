"""Incremental append + compaction (operators/append.py).

Contract: build(a) + append(b) answers every query with the SAME scored
result set as build(a ∪ b) — scores bit-identical (tf/dl/df/N/avgdl all
equal); only doc_id ASSIGNMENT differs (append order vs global conv_id
rank), so comparisons key on conv_id.  Appends must be disjoint,
resumable mid-way, reject a different input on resume, and compaction
must preserve results while collapsing generations."""

import os

import pytest

QUERIES = [
    "roll OR dice",
    "roll AND dice",
    '"crystal kingdom"',
    "the",
    '(roll OR "crystal kingdom") AND dice',
]


def _split_rows(t1_rows):
    convs = sorted({r["conv_id"] for r in t1_rows})
    a_set = set(convs[:30])
    a = [r for r in t1_rows if r["conv_id"] in a_set]
    b = [r for r in t1_rows if r["conv_id"] not in a_set]
    return a, b


def _by_conv(eng, q, **kw):
    # k large enough to rank EVERY match: top-k boundary ties could
    # otherwise resolve differently under different doc_id assignments
    res = eng.search(q, k=100000, **kw)
    convs = eng.index.turns.select("doc_id", "conv_id").distinct()
    rows = res.join(convs, "doc_id").collect()
    return sorted((r["conv_id"], r["turn_idx"], r["score"]) for r in rows)


@pytest.fixture(scope="module")
def appended(spark, t1_rows, tmp_path_factory):
    """full = build(a∪b); inc = build(a) then append(b)."""
    from joie_spark.engine import Engine

    a, b = _split_rows(t1_rows)
    d_full = str(tmp_path_factory.mktemp("ix_full"))
    d_inc = str(tmp_path_factory.mktemp("ix_inc"))
    kw = dict(n_buckets=8, docs_per_block=8, block_chunks=2)
    full = Engine.build(spark, spark.createDataFrame(t1_rows), d_full, **kw)
    inc = Engine.build(spark, spark.createDataFrame(a), d_inc, **kw)
    inc.append(spark.createDataFrame(b))
    return full, inc


def test_append_equals_full_rebuild(appended):
    full, inc = appended
    assert full.index.stats["N"] == inc.index.stats["N"]
    assert full.index.stats["avgdl"] == inc.index.stats["avgdl"]
    assert full.index.stats["n_terms"] == inc.index.stats["n_terms"]
    for q in QUERIES:
        assert _by_conv(full, q, mode="exhaustive") == _by_conv(
            inc, q, mode="exhaustive"
        ), q


def test_append_wand_and_batch_paths_sound(appended):
    """The WAND path must stay rank-identical after the avgdl drift
    (enc_avgdl correction), for single and batch queries."""
    full, inc = appended
    for q in ["roll OR dice", "the", "you OR so OR dice"]:
        assert _by_conv(full, q) == _by_conv(inc, q), q  # auto → WAND
    flat = ["roll OR dice", "roll AND dice", "the"]
    for eng in (full, inc):
        batch = eng.search_many(flat, k=8).collect()
        batch_forced = eng.search_many(
            flat, k=8, direct_threshold=0, probe_blocks=2
        ).collect()
        assert batch == batch_forced
        singles = [
            (r["query_id"], r["score"])
            for r in batch
        ]
        want = [
            (i, r["score"])
            for i, q in enumerate(flat)
            for r in eng.search(q, k=8, mode="exhaustive").collect()
        ]
        assert singles == want


def test_append_filters_and_match_set(appended, t1_oracle):
    full, inc = appended
    got = _by_conv(inc, "roll OR dice", where="role = 'user'", mode="exhaustive")
    want = _by_conv(full, "roll OR dice", where="role = 'user'", mode="exhaustive")
    assert got == want and got
    m_full = full.match_set("roll AND dice").join(
        full.index.turns.select("doc_id", "conv_id").distinct(), "doc_id"
    ).collect()
    m_inc = inc.match_set("roll AND dice").join(
        inc.index.turns.select("doc_id", "conv_id").distinct(), "doc_id"
    ).collect()
    assert sorted((r["conv_id"], r["turn_idx"]) for r in m_full) == sorted(
        (r["conv_id"], r["turn_idx"]) for r in m_inc
    )


def test_append_rejects_overlapping_convs(appended, spark, t1_rows):
    _full, inc = appended
    with pytest.raises(ValueError, match="disjoint"):
        inc.append(spark.createDataFrame(t1_rows[:5]))


def test_append_requires_complete_build(spark, t1_rows, tmp_path):
    from joie_spark.operators.append import append_index

    with pytest.raises(ValueError, match="completed build"):
        append_index(spark, spark.createDataFrame(t1_rows), str(tmp_path / "nope"))


def test_append_resumes_after_crash(spark, t1_rows, tmp_path, monkeypatch):
    """Kill the append mid-way (first postings write of the delta gen),
    re-run it, and require the result to match an uncrashed append."""
    from joie_spark.engine import Engine
    from joie_spark.sources.tables import Manifest, ParquetManifestFormat

    a, b = _split_rows(t1_rows)
    d = str(tmp_path / "ix_crash")
    eng = Engine.build(
        spark, spark.createDataFrame(a), d, n_buckets=8, docs_per_block=8,
        block_chunks=1,
    )
    real_write = ParquetManifestFormat.write

    def failing_write(self, df, index_dir, table, partition_by=(), subunit=None):
        if table == "postings" and subunit and subunit.startswith("gen="):
            raise RuntimeError("injected crash before delta postings")
        return real_write(self, df, index_dir, table, partition_by, subunit)

    monkeypatch.setattr(ParquetManifestFormat, "write", failing_write)
    with pytest.raises(RuntimeError, match="injected"):
        eng.append(spark.createDataFrame(b))
    monkeypatch.setattr(ParquetManifestFormat, "write", real_write)

    # resume with a DIFFERENT input must be refused
    with pytest.raises(ValueError, match="fingerprint"):
        eng.append(spark.createDataFrame(b[: len(b) // 2]))

    eng.append(spark.createDataFrame(b))  # resume completes
    man = Manifest.load(d)
    assert sum(1 for e in man.entries if e["stage"] == "append") == 1
    d_ref = str(tmp_path / "ix_ref")
    ref = Engine.build(
        spark, spark.createDataFrame(t1_rows), d_ref, n_buckets=8,
        docs_per_block=8, block_chunks=1,
    )
    for q in ["roll OR dice", '"crystal kingdom"']:
        assert _by_conv(eng, q, mode="exhaustive") == _by_conv(
            ref, q, mode="exhaustive"
        ), q


def test_wand_sound_under_extreme_avgdl_drift(spark, t1_rows, tmp_path):
    """Append documents ~20x longer than the base corpus so avgdl jumps
    hard: every pruned path (single WAND, batch direct, batch forced-θ)
    must still equal the exhaustive scorer — the enc_avgdl ub correction
    is exactly what keeps stale block-max bounds sound here."""
    from joie_spark.engine import Engine

    d = str(tmp_path / "ix_drift")
    eng = Engine.build(
        spark, spark.createDataFrame(t1_rows), d, n_buckets=8,
        docs_per_block=8, block_chunks=1,
    )
    avgdl_before = eng.index.stats["avgdl"]
    ts = t1_rows[0]["ts"]
    filler = " ".join(f"filler{j % 40}" for j in range(260))
    long_rows = [
        {
            "conv_id": f"zz-long-{i:03d}", "turn_idx": 0, "role": "user",
            "text": f"roll dice kingdom {filler}", "tool": "", "ts": ts,
        }
        for i in range(50)
    ]
    eng.append(spark.createDataFrame(long_rows))
    assert eng.index.stats["avgdl"] > 1.5 * avgdl_before  # drift is real

    for q in ["roll OR dice", "roll AND dice", "kingdom OR dice"]:
        want = [tuple(r) for r in eng.search(q, k=8, mode="exhaustive").collect()]
        assert [tuple(r) for r in eng.search(q, k=8).collect()] == want, q
        got_f = [
            (r["doc_id"], r["turn_idx"], r["score"])
            for r in eng.search_many(
                [q], k=8, direct_threshold=0, probe_blocks=1
            ).collect()
        ]
        assert got_f == [(a, b, c) for a, b, c in want], q


def test_compaction_preserves_results(appended, spark, t1_rows, tmp_path_factory):
    from joie_spark.engine import Engine

    a, b = _split_rows(t1_rows)
    d = str(tmp_path_factory.mktemp("ix_compact"))
    eng = Engine.build(
        spark, spark.createDataFrame(a), d, n_buckets=8, docs_per_block=8,
        block_chunks=2,
    )
    eng.append(spark.createDataFrame(b))
    before = {q: _by_conv(eng, q) for q in QUERIES}
    eng.compact()
    # one postings/blocks generation left, bounds re-tightened
    post_gens = [x for x in os.listdir(os.path.join(d, "postings")) if x.startswith("gen=")]
    block_gens = [x for x in os.listdir(os.path.join(d, "blocks")) if x.startswith("gen=")]
    assert len(post_gens) == 1 and len(block_gens) == 1
    enc = eng.index.blocks.select("enc_avgdl").distinct().collect()
    assert len(enc) == 1 and enc[0][0] == pytest.approx(eng.index.stats["avgdl"])
    for q in QUERIES:
        assert _by_conv(eng, q) == before[q], q
