"""term_vectors (ES _termvectors) and rank_eval (ES _rank_eval) against
pure-Python expectations computed from the oracle index: tf/df/positions/
offsets must match re-tokenization exactly, and the IR metrics must match
hand-rolled precision/recall/MRR/NDCG over the oracle's own ranking."""

import math

import pytest


# ---------------------------------------------------------------------------
# term_vectors


def _expected_conv_tv(oracle, doc_id):
    """(term, term_id, tf, df) rows, term ASC, tf summed over turns."""
    term_of = {tid: t for t, tid in oracle.term_id.items()}
    tf = {}
    for (d, _ti), turn in oracle.turns.items():
        if d != doc_id:
            continue
        for tid, poss in turn.positions.items():
            tf[tid] = tf.get(tid, 0) + len(poss)
    return sorted(
        (term_of[tid], tid, n, oracle.df[tid]) for tid, n in tf.items()
    )


def test_term_vectors_conversation(t1_engine, t1_oracle):
    doc_id = 3
    got = [
        (r["term"], r["term_id"], r["tf"], r["df"])
        for r in t1_engine.term_vectors(doc_id).collect()
    ]
    assert got == _expected_conv_tv(t1_oracle, doc_id)


def test_term_vectors_turn_positions_and_offsets(t1_engine, t1_oracle):
    doc_id, turn_idx = 3, 0
    turn = t1_oracle.turns[(doc_id, turn_idx)]
    term_of = {tid: t for t, tid in t1_oracle.term_id.items()}
    want = sorted(
        (
            term_of[tid],
            tid,
            len(poss),
            t1_oracle.df[tid],
            poss,
            [turn.tokens[p][0] for p in poss],
            [turn.tokens[p][1] for p in poss],
        )
        for tid, poss in turn.positions.items()
    )
    got = [
        (
            r["term"],
            r["term_id"],
            r["tf"],
            r["df"],
            list(r["positions"]),
            list(r["start_offsets"]),
            list(r["end_offsets"]),
        )
        for r in t1_engine.term_vectors(doc_id, turn_idx).collect()
    ]
    assert got == want


def test_term_vectors_unknown_doc_empty(t1_engine):
    assert t1_engine.term_vectors(10**9).count() == 0


# ---------------------------------------------------------------------------
# rank_eval


def _expected_metrics(oracle, query, judged, k):
    """ES-definition metrics over the oracle's own top-k ranking."""
    ranked = oracle.search(query, k=k)  # [(doc, turn, score)] in rank order
    grade = {(d, t): g for d, t, g in judged}
    grades = [grade.get((d, t), 0) for d, t, _s in ranked]
    nret = len(grades)
    nrel_ret = sum(1 for g in grades if g > 0)
    n_rel = sum(1 for *_dt, g in judged if g > 0)
    precision = nrel_ret / nret if nret else 0.0
    recall = nrel_ret / n_rel if n_rel else 0.0
    mrr = 0.0
    for i, g in enumerate(grades):
        if g > 0:
            mrr = 1.0 / (i + 1)
            break
    dcg = sum(
        (2.0**g - 1.0) / math.log2(i + 2) for i, g in enumerate(grades)
    )
    ideal = sorted((g for *_dt, g in judged if g > 0), reverse=True)[:k]
    idcg = sum(
        (2.0**g - 1.0) / math.log2(i + 2) for i, g in enumerate(ideal)
    )
    ndcg = dcg / idcg if idcg else 0.0
    r6 = lambda x: round(x, 6)  # noqa: E731
    return (r6(precision), r6(recall), r6(mrr), r6(ndcg))


def test_rank_eval_matches_hand_metrics(t1_engine, t1_oracle):
    k = 5
    # judgments: the oracle's rank-1 hit is grade 2, rank-3 grade 1, plus
    # one judged-relevant row the query can't retrieve (recall < 1) and
    # one judged-irrelevant retrieved row (grade 0 exercises the fillna).
    requests = {}
    for q in ("roll OR dice", "the", '"crystal kingdom"'):
        ranked = t1_oracle.search(q, k=k)
        judged = []
        if len(ranked) >= 1:
            judged.append((ranked[0][0], ranked[0][1], 2))
        if len(ranked) >= 3:
            judged.append((ranked[2][0], ranked[2][1], 1))
        if len(ranked) >= 2:
            judged.append((ranked[1][0], ranked[1][1], 0))
        if all((d, t) != (1, 0) for d, t, _g in judged):
            judged.append((1, 0, 1))  # an unretrieved-but-relevant row
        requests[q] = judged

    rows = t1_engine.rank_eval(requests, k=k).collect()
    assert [r["query"] for r in rows] == list(requests)
    for r in rows:
        want = _expected_metrics(t1_oracle, r["query"], requests[r["query"]], k)
        got = (r["precision_k"], r["recall_k"], r["mrr"], r["ndcg_k"])
        assert got == pytest.approx(want, abs=1e-9), r["query"]


def test_rank_eval_no_relevant_judgments_scores_zero(t1_engine):
    rows = t1_engine.rank_eval(
        {"roll OR dice": [(1, 0, 0)]}, k=5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["precision_k"], r["recall_k"], r["mrr"], r["ndcg_k"]) == (
        0.0,
        0.0,
        0.0,
        0.0,
    )


def test_rank_eval_oov_query_scores_zero(t1_engine):
    rows = t1_engine.rank_eval(
        {"zzzzunseenzzz": [(1, 0, 2)]}, k=5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["precision_k"], r["recall_k"], r["mrr"], r["ndcg_k"]) == (
        0.0,
        0.0,
        0.0,
        0.0,
    )


# ---------------------------------------------------------------------------
# function_score (filter/weight over turn metadata)


def _oracle_weighted(oracle, query, weight_fn, k):
    """All oracle matches rescored by weight_fn(turn), re-ranked."""
    allm = oracle.search(query, k=10**6)
    rescored = [
        (d, t, s * weight_fn(oracle.turns[(d, t)])) for d, t, s in allm
    ]
    rescored.sort(key=lambda r: (-r[2], r[0], r[1]))
    return rescored[:k]


def test_function_score_role_weight_rank_identical(t1_engine, t1_oracle):
    q = "roll OR dice"
    want = _oracle_weighted(
        t1_oracle, q, lambda t: 2.0 if t.role == "assistant" else 1.0, 10
    )
    got = [
        (r["doc_id"], r["turn_idx"], r["score"])
        for r in t1_engine.search_function_score(
            q, "CASE WHEN role = 'assistant' THEN 2.0 ELSE 1.0 END", k=10
        ).collect()
    ]
    assert got == want  # bit-identical scores, exact order


def test_function_score_dl_weight_rank_identical(t1_engine, t1_oracle):
    q = "the"
    want = _oracle_weighted(t1_oracle, q, lambda t: 1.0 / (1.0 + t.dl), 10)
    got = [
        (r["doc_id"], r["turn_idx"], r["score"])
        for r in t1_engine.search_function_score(
            q, "1e0 / (1e0 + dl)", k=10  # 1e0: double literal (1.0 is DECIMAL in Spark SQL)
        ).collect()
    ]
    assert got == want


def test_function_score_constant_one_equals_search(t1_engine):
    q = "roll OR dice"
    base = [tuple(r) for r in t1_engine.search(q, k=10).collect()]
    fs = [
        tuple(r)
        for r in t1_engine.search_function_score(q, "1.0", k=10).collect()
    ]
    assert fs == base


def test_function_score_rejects_empty_expr(t1_engine):
    with pytest.raises(ValueError):
        t1_engine.search_function_score("roll", "  ")


# ---------------------------------------------------------------------------
# search_docs (conversation-level BM25)


def _oracle_doc_search(oracle, q, k, role=None):
    """True doc-level BM25 over the existentially-lifted match set,
    folded in term_id order (the engine's sorted-struct fold)."""
    from joie_spark.oracle import bm25_idf, bm25_term
    from joie_spark.operators.query import _literal_texts
    from joie_spark.plans.parser import parse_query
    from joie_spark.tokenizer import tokenize_terms

    words = sorted(
        {w for lit in _literal_texts(parse_query(q)) for w in tokenize_terms(lit)}
    )
    qids = sorted({oracle.term_id[w] for w in words if w in oracle.term_id})
    matches = oracle.match_set(q)
    if role is not None:
        matches = {key for key in matches if oracle.turns[key].role == role}
    mdocs = sorted({d for d, _t in matches})
    n_docs = len(oracle.doc_meta)
    avgdl = sum(m["total_dl"] for m in oracle.doc_meta.values()) / n_docs
    dfd = {
        t: len({d for d, _ti in oracle.postings.get(t, ())}) for t in qids
    }
    tf_by_doc = {d: {} for d in mdocs}
    for (d, _ti), turn in oracle.turns.items():
        if d not in tf_by_doc:
            continue
        for t in qids:
            if t in turn.positions:
                tf_by_doc[d][t] = tf_by_doc[d].get(t, 0) + len(
                    turn.positions[t]
                )
    out = []
    for d in mdocs:
        dl = oracle.doc_meta[d]["total_dl"]
        s = 0.0
        for t in qids:
            tf = tf_by_doc[d].get(t, 0)
            if tf:
                s += bm25_term(tf, dl, avgdl, bm25_idf(n_docs, dfd[t]))
        out.append((d, s))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out[:k]


@pytest.mark.parametrize(
    "q", ["roll OR dice", "the", '"crystal kingdom"', "roll AND dice OR game"]
)
def test_search_docs_rank_identical(q, t1_engine, t1_oracle):
    want = _oracle_doc_search(t1_oracle, q, 10)
    got = [
        (r["doc_id"], r["score"])
        for r in t1_engine.search_docs(q, k=10).collect()
    ]
    assert got == want  # bit-identical doc-level scores, exact order


def test_search_docs_where_filters_match_not_score(t1_engine, t1_oracle):
    q = "roll OR dice"
    want = _oracle_doc_search(t1_oracle, q, 10, role="user")
    got = [
        (r["doc_id"], r["score"])
        for r in t1_engine.search_docs(q, k=10, where="role = 'user'").collect()
    ]
    assert got == want


def test_search_docs_oov_empty(t1_engine):
    assert t1_engine.search_docs("zzzzunseenzzz").count() == 0


# ---------------------------------------------------------------------------
# analyze (driver-side analysis chain)


def test_analyze_matches_tokenizer_and_dict(t1_engine, t1_oracle):
    txt = "The Crystal KINGDOM rolls... zzzzunseenzzz dice!"
    from joie_spark.tokenizer import tokenize

    toks = tokenize(txt)
    want = [
        {
            "token": t.term,
            "term_id": t1_oracle.term_id.get(t.term, 0),
            "start_offset": t.start,
            "end_offset": t.end,
            "position": i,
        }
        for i, t in enumerate(toks)
    ]
    assert t1_engine.analyze(txt) == want
    assert any(e["term_id"] == 0 for e in want)  # the OOV token is exercised


def test_analyze_empty(t1_engine):
    assert t1_engine.analyze("") == []
