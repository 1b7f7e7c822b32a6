"""Property tests for the exact substring-duplication audit
(``dedup.duplicate_spans``) and the quantized unigram-LM scorer
(``textstats.unigram_surprisal``) against pure-Python references on
adversarial tiny corpora — small vocabularies force heavy span-hash
collisions, so the interval-merge (gaps-and-islands) logic is exercised
far harder than by the real corpus."""

from __future__ import annotations

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from concordium_transaction_logger_spark.operators import dedup, textstats


def _write_docs(spark, tmp_path, token_lists):
    # hypothesis reuses one tmp_path across examples: rewriting the corpus
    # at the same sf_dir must evict the session's per-(session, sf_dir)
    # index caches (bpe fit, shingle index, ...) or examples see stale fits
    from concordium_transaction_logger_spark.cache import release_corpus

    release_corpus(spark, str(tmp_path))
    rows = [
        Row(
            doc_id=i,
            text=" ".join(toks),
            lang="en",
            source=f"src{i % 3}",
            n_chars=len(" ".join(toks)),
        )
        for i, toks in enumerate(token_lists)
    ]
    path = str(tmp_path)
    spark.createDataFrame(rows).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "documents.parquet")
    )
    return path


def _half_up(num, den):
    """round(num/den) with exact .5 ties going UP (num, den >= 0) — the
    integer form (2*num + den) // (2*den) shared by op + oracle."""
    return (2 * num + den) // (2 * den)


def _py_duplicate_spans(token_lists, span_l):
    """Reference: hash every span_l-token window, mark windows occurring
    >= 2 times corpus-wide, merge overlapping windows per doc."""
    from collections import Counter

    counts = Counter()
    for toks in token_lists:
        for i in range(len(toks) - span_l + 1):
            counts[tuple(toks[i : i + span_l])] += 1
    out = {}
    for doc_id, toks in enumerate(token_lists):
        pos = [
            i
            for i in range(len(toks) - span_l + 1)
            if counts[tuple(toks[i : i + span_l])] >= 2
        ]
        segs = []
        for p in pos:
            if segs and p < segs[-1][1]:
                segs[-1][1] = max(segs[-1][1], p + span_l)
            else:
                segs.append([p, p + span_l])
        n_dup = sum(e - s for s, e in segs)
        # Integer half-up — Python round() banker's-rounds exact .5 ties
        # (25000/16 -> 1562) while the engine and DuckDB round half-up.
        pm = _half_up(1000 * n_dup, len(toks)) if toks else 0
        out[doc_id] = (len(toks), len(segs), n_dup, pm)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_lists=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=25),
        min_size=1,
        max_size=6,
    )
)
def test_duplicate_spans_matches_python_reference(spark, tmp_path, token_lists):
    span_l = 3
    sf = _write_docs(spark, tmp_path, token_lists)
    got = {
        r.doc_id: (r.n_tokens, r.n_dup_spans, r.n_dup_tokens, r.dup_permille)
        for r in dedup.duplicate_spans(spark, sf, span_l=span_l).collect()
    }
    assert got == _py_duplicate_spans(token_lists, span_l)


def _py_surprisal(token_lists):
    from collections import Counter

    cnt = Counter(t for toks in token_lists for t in toks)
    total = sum(cnt.values())
    bits = {t: total.bit_length() - c.bit_length() for t, c in cnt.items()}
    out = {}
    for doc_id, toks in enumerate(token_lists):
        if not toks:
            continue
        s = sum(bits[t] for t in toks)
        out[doc_id] = (
            len(toks),
            s,
            max(bits[t] for t in toks),
            _half_up(1000 * s, len(toks)),
        )
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_lists=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=20),
        min_size=1,
        max_size=5,
    )
)
def test_unigram_surprisal_matches_python_reference(spark, tmp_path, token_lists):
    sf = _write_docs(spark, tmp_path, token_lists)
    got = {
        r.doc_id: (
            r.n_tokens,
            r.total_surprisal_bits,
            r.max_token_bits,
            r.mean_surprisal_millibits,
        )
        for r in textstats.unigram_surprisal(spark, sf).collect()
    }
    assert got == _py_surprisal(token_lists)


def test_unigram_surprisal_half_up_on_exact_tie(spark, tmp_path):
    """Seeded regression for the r5 hypothesis flake: 16 tokens carrying
    25 total bits -> 25000/16 = 1562.5 exactly. The engine, the DuckDB
    oracle and the Python reference must all say 1563 (half-up), where
    Python's float round() says 1562 (banker's)."""
    toks = ["aa"] * 13 + ["bb", "cc", "dd"]  # total 16 (5 bits);
    # aa: count 13 -> 5-4 = 1 bit x13; bb/cc/dd: count 1 -> 4 bits x3 => s=25
    sf = _write_docs(spark, tmp_path, [toks])
    row = textstats.unigram_surprisal(spark, sf).collect()[0]
    assert (row.n_tokens, row.total_surprisal_bits) == (16, 25)
    assert row.mean_surprisal_millibits == 1563
    assert _py_surprisal([toks])[0][3] == 1563


def test_bigram_vocab_floor_scores_hapax_at_oov(spark, tmp_path):
    """The r6 bigram-LM vocabulary floor: a corpus bigram below
    BIGRAM_MIN_COUNT leaves the model and its occurrences score at the
    OOV backoff (bitlen of the corpus bigram total), while repeated
    bigrams keep the conditional bitlen(cnt1)-bitlen(cnt2) cost. Doc 0
    repeats 'aa bb' (kept); doc 1's 'cc dd' is hapax (OOV)."""
    sf = _write_docs(
        spark, tmp_path, [["aa", "bb"] * 3, ["cc", "dd"]]
    )
    rows = {
        r.doc_id: r for r in textstats.bigram_surprisal(spark, sf).collect()
    }
    # corpus bigrams: doc0 contributes 'aa bb'x3, 'bb aa'x2; doc1 'cc dd'x1
    tot = 6
    oov = tot.bit_length()
    # kept: cnt('aa bb')=3, context 'aa' total=3 -> bits 2-2=0;
    #       cnt('bb aa')=2, context 'bb' total=2 -> bits 2-2=0
    assert rows[0].total_surprisal_bits == 0
    assert rows[0].max_bigram_bits == 0
    # hapax 'cc dd' pruned -> OOV cost
    assert rows[1].n_bigrams == 1
    assert rows[1].total_surprisal_bits == oov
    assert rows[1].max_bigram_bits == oov
    assert rows[1].mean_surprisal_millibits == 1000 * oov


def test_duplicate_spans_planted_full_duplicate(spark, tmp_path):
    """Two identical docs: every window duplicated, one merged span covering
    the whole doc; a third unrelated doc reports zero."""
    toks = list("abcdefghij")
    sf = _write_docs(spark, tmp_path, [toks, toks, list("zzzyyyxxxw")])
    rows = {r.doc_id: r for r in dedup.duplicate_spans(spark, sf, span_l=4).collect()}
    for d in (0, 1):
        assert rows[d].n_dup_spans == 1
        assert rows[d].n_dup_tokens == 10
        assert rows[d].dup_permille == 1000
    assert rows[2].n_dup_spans == 0
    assert rows[2].dup_permille == 0


def _py_clean_text(token_lists, span_l):
    """Reference: remove every duplicated-window occurrence except the
    globally first (min (doc_id, pos)) one; rebuild from kept tokens."""
    from collections import Counter

    counts = Counter()
    for toks in token_lists:
        for i in range(len(toks) - span_l + 1):
            counts[tuple(toks[i : i + span_l])] += 1
    seen = set()
    out = {}
    for doc_id, toks in enumerate(token_lists):
        covered = set()
        for i in range(len(toks) - span_l + 1):
            key = tuple(toks[i : i + span_l])
            if counts[key] >= 2:
                if key in seen:
                    covered.update(range(i, i + span_l))
                else:
                    seen.add(key)
            else:
                seen.add(key)
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[doc_id] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_lists=st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=20),
        min_size=1,
        max_size=5,
    )
)
def test_dedup_clean_text_matches_python_reference(spark, tmp_path, token_lists):
    span_l = 3
    sf = _write_docs(spark, tmp_path, token_lists)
    got = {
        r.doc_id: (r.clean_text, r.n_tokens, r.n_removed)
        for r in dedup.dedup_clean_text(spark, sf, span_l=span_l).collect()
    }
    assert got == _py_clean_text(token_lists, span_l)


def test_dedup_clean_text_first_copy_survives(spark, tmp_path):
    toks = list("abcdefghij")
    sf = _write_docs(spark, tmp_path, [toks, toks, toks])
    rows = {r.doc_id: r for r in dedup.dedup_clean_text(spark, sf, span_l=4).collect()}
    assert rows[0].clean_text == " ".join(toks) and rows[0].n_removed == 0
    for d in (1, 2):
        assert rows[d].clean_text == "" and rows[d].n_removed == 10


def _py_dsir(token_lists, n_buckets=256, val_permille=100):
    """Reference DSIR: distinct 3-gram shingles per doc, md5 bucket,
    val-split target by the same md5 doc bucket rule, per-doc sum of
    bit-length-quantized log ratios with add-one smoothing."""
    import hashlib

    def md5hex(s):
        return hashlib.md5(s.encode()).hexdigest()

    feats = {}
    for doc_id, toks in enumerate(token_lists):
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        if sh:
            feats[doc_id] = [int(md5hex(s)[:4], 16) % n_buckets for s in sorted(sh)]
    is_val = {
        d: int(md5hex(f"{d}#v1")[:8], 16) % 1000 < val_permille for d in feats
    }
    c_cnt, t_cnt = {}, {}
    for d, bs in feats.items():
        for b in bs:
            c_cnt[b] = c_cnt.get(b, 0) + 1
            if is_val[d]:
                t_cnt[b] = t_cnt.get(b, 0) + 1
    ctot, ttot = sum(c_cnt.values()), sum(t_cnt.values())
    w = {
        b: ((t_cnt.get(b, 0) + 1).bit_length() - (ttot + 1).bit_length())
        - ((c_cnt[b] + 1).bit_length() - (ctot + 1).bit_length())
        for b in c_cnt
    }
    out = {}
    for d, bs in feats.items():
        s = sum(w[b] for b in bs)
        # Half away from zero (s may be negative), matching the engine.
        pm = _half_up(1000 * s, len(bs)) if s >= 0 else -_half_up(-1000 * s, len(bs))
        out[d] = (len(bs), s, pm)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_lists=st.lists(
        st.lists(st.sampled_from("abcdef"), min_size=3, max_size=15),
        min_size=2,
        max_size=6,
    )
)
def test_dsir_weights_match_python_reference(spark, tmp_path, token_lists):
    from concordium_transaction_logger_spark.cache import release_corpus
    from concordium_transaction_logger_spark.operators import sampling

    sf = _write_docs(spark, tmp_path, token_lists)
    release_corpus(spark, sf)  # the shingle index memoizes per (session, dir)
    try:
        got = {
            r.doc_id: (r.n_feats, r.score_bits, r.mean_score_millibits)
            for r in sampling.dsir_weights(spark, sf).collect()
        }
    finally:
        release_corpus(spark, sf)
    assert got == _py_dsir(token_lists)


def _py_perceptron(token_lists, n_buckets=64, epochs=8):
    """Reference pocket perceptron: binary hashed-shingle features + bias,
    cost-sensitive batch updates, best-accuracy snapshot (earliest epoch
    on ties). Labels follow the quality gate (here: length >= 100 chars,
    since crafted text is all lowercase+spaces)."""
    import hashlib

    feats, lab = {}, {}
    for d, toks in enumerate(token_lists):
        text = " ".join(toks)
        sh = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
        bs = {
            int(hashlib.md5(s.encode()).hexdigest()[:4], 16) % n_buckets
            for s in sh
        }
        feats[d] = sorted(bs) + [n_buckets]  # bias
        lab[d] = 1 if len(text) >= 100 else -1
    n_pos = sum(1 for y in lab.values() if y > 0)
    n_neg = len(lab) - n_pos
    cw = {1: n_neg, -1: n_pos}
    w = [0] * (n_buckets + 1)

    def margin(d):
        return sum(w[b] for b in feats[d])

    def acc():
        return sum(1 for d, y in lab.items() if y * margin(d) > 0)

    best = (-1, None)
    for _ in range(epochs):
        delta = [0] * (n_buckets + 1)
        for d, y in lab.items():
            if y * margin(d) <= 0:
                for b in feats[d]:
                    delta[b] += y * cw[y]
        w = [a + b for a, b in zip(w, delta)]
        a = acc()
        if a > best[0]:
            best = (a, list(w))
    w = best[1]
    return {
        d: (y, margin(d), 1 if margin(d) > 0 else -1, y * margin(d) > 0)
        for d, y in lab.items()
    }


@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_lists=st.lists(
        st.lists(st.sampled_from(["alpha", "beta", "gamma", "delta", "omega"]),
                 min_size=3, max_size=40),
        min_size=3,
        max_size=8,
    )
)
def test_perceptron_train_matches_python_reference(spark, tmp_path, token_lists):
    from hypothesis import assume

    from concordium_transaction_logger_spark.cache import release_corpus
    from concordium_transaction_logger_spark.operators import textstats

    # single-class corpora are a loud ValueError by contract (tested
    # below), not a trained model — only two-class examples compare
    labels = {len(" ".join(toks)) >= 100 for toks in token_lists}
    assume(labels == {True, False})
    sf = _write_docs(spark, tmp_path, token_lists)
    release_corpus(spark, sf)
    try:
        got = {
            r.doc_id: (r.label, r.margin, r.pred, r.correct)
            for r in textstats.perceptron_train(spark, sf).collect()
        }
    finally:
        release_corpus(spark, sf)
    assert got == _py_perceptron(token_lists)


def test_perceptron_rejects_single_class_labels(spark, tmp_path):
    import pytest

    from concordium_transaction_logger_spark.cache import release_corpus
    from concordium_transaction_logger_spark.operators import textstats

    # every doc fails the gate (too short) -> all labels -1: the old code
    # silently returned a frozen all-zero model predicting -1 everywhere
    sf = _write_docs(spark, tmp_path, [["alpha"] * 3] * 3)
    release_corpus(spark, sf)
    try:
        with pytest.raises(ValueError, match="single-class"):
            textstats.perceptron_train(spark, sf).collect()
    finally:
        release_corpus(spark, sf)


def _py_bpe(token_lists, n_merges=6):
    """Reference BPE trainer: all-adjacent-pair counts over the distinct
    word/frequency table, max count with lexicographic tie-break, greedy
    leftmost non-overlapping merge application."""
    from collections import Counter

    wf = Counter(t for toks in token_lists for t in toks)
    reps = {w: list(w) for w in wf}
    out = []
    for step in range(1, n_merges + 1):
        cnt = Counter()
        for w, f in wf.items():
            s = reps[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (l, r), c = best
        out.append((step, l, r, l + r, c))
        for w in reps:
            s, ns, i = reps[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    ns.append(l + r)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            reps[w] = ns
    return out


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_lists=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6), min_size=1, max_size=15
        ),
        min_size=1,
        max_size=4,
    )
)
def test_bpe_merges_match_python_reference(spark, tmp_path, token_lists):
    from concordium_transaction_logger_spark.operators import textstats

    sf = _write_docs(spark, tmp_path, token_lists)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in textstats.bpe_merges(spark, sf).collect()
    ]
    assert got == _py_bpe(token_lists)
