"""Property-based tests (hypothesis) for the pure-python subsystems:
variable expansion, statement splitting, name patterns, DDL types."""

from __future__ import annotations

import re
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from conftest import half_up

from bricolage_spark.engine import split_statements
from bricolage_spark.exception import ParameterError
from bricolage_spark.sqltext import Variables, expand_string, list_variables
from bricolage_spark.streaming.streaming_load import compile_name_pattern, format_path

names = st.text(
    alphabet=string.ascii_lowercase + string.digits + "_", min_size=1, max_size=8
).filter(lambda s: not s[0].isdigit())
plain_values = st.text(
    alphabet=string.ascii_letters + string.digits + " .,-", max_size=20
)


@given(st.dictionaries(names, plain_values, min_size=0, max_size=5))
@settings(max_examples=100)
def test_resolve_of_plain_values_is_identity(mapping):
    """Values without $refs resolve to themselves."""
    resolved = Variables(mapping).resolve()
    for k, v in mapping.items():
        assert resolved[k] == str(v)


@given(st.dictionaries(names, plain_values, min_size=1, max_size=5), names)
@settings(max_examples=100)
def test_expand_uses_bound_value_or_raises(mapping, extra):
    v = Variables(mapping).resolve()
    text = " ".join(f"${k}" for k in mapping)
    out = v.expand(text)
    for k in mapping:
        assert str(mapping[k]) in out or mapping[k] == ""
    if extra not in mapping:
        with pytest.raises(ParameterError):
            v.expand(f"${extra}")


@given(names, names)
@settings(max_examples=50)
def test_both_var_syntaxes_equivalent(a, b):
    lookup = {a: "X", b: "Y"}.__getitem__
    assert expand_string(f"${{{a}}}", lookup) == expand_string(f"${a}", lookup)


@given(st.lists(names, min_size=1, max_size=6, unique=True))
@settings(max_examples=50)
def test_self_referential_chain_resolves(chain):
    """a -> b -> c -> ... -> literal resolves; closing the loop raises."""
    mapping = {chain[i]: f"${chain[i+1]}" for i in range(len(chain) - 1)}
    mapping[chain[-1]] = "END"
    assert Variables(mapping).resolve()[chain[0]] == "END"
    if len(chain) > 1:
        mapping[chain[-1]] = f"${chain[0]}"  # close the cycle
        with pytest.raises(ParameterError, match="recursive"):
            Variables(mapping).resolve()


@given(st.text(alphabet=string.printable, max_size=100))
@settings(max_examples=100)
def test_list_variables_subset_of_expansion_targets(text):
    """Every listed variable is expandable; expansion never raises when
    every listed name is bound."""
    vars_ = list_variables(text)
    lookup = {v: "_" for v in vars_}
    expand_string(text, lookup.__getitem__)  # must not raise


@given(st.lists(st.text(alphabet=string.ascii_letters + " ='\";", min_size=1, max_size=30), min_size=1, max_size=5))
@settings(max_examples=100)
def test_split_statements_preserves_nonempty_content(parts):
    """Joining with ';' then splitting yields only non-empty statements and
    never produces a statement containing an unquoted ';'."""
    joined = ";".join(parts)
    stmts = split_statements(joined)
    for s in stmts:
        assert s.strip()
        # no unquoted semicolons survive
        depth = 0
        for ch in s:
            if ch == "'":
                depth ^= 1
            assert not (ch == ";" and depth == 0)


@given(st.datetimes(min_value=__import__("datetime").datetime(1990, 1, 1),
                    max_value=__import__("datetime").datetime(2099, 12, 31)),
       st.integers(min_value=0, max_value=99))
@settings(max_examples=100)
def test_name_pattern_roundtrip(dt, seq):
    """Any strftime-built file name matches its compiled pattern, and the
    persistent path re-formats from the captured fields."""
    pat = compile_name_pattern("%Y%m%d-%H%M_%Q.json")
    name = f"{dt:%Y%m%d-%H%M}_{seq:02d}.json"
    m = pat.match(name)
    assert m and m.group("year") == f"{dt:%Y}"
    out = format_path("arch/%Y/%m/%d", name, pat)
    assert out == f"arch/{dt:%Y}/{dt:%m}/{dt:%d}"


@given(st.text(max_size=40))
@settings(max_examples=100)
def test_name_pattern_never_matches_with_slash(junk):
    pat = compile_name_pattern("%*_%Q.log")
    if "/" in junk:
        assert not pat.match(junk + "_01.log") or "/" not in junk


# ---------------------------------------------------------------------------
# Textual operator semantics vs a pure-Python mirror (SURVEY §2.7 q57/q58)
# ---------------------------------------------------------------------------

words_st = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=3), min_size=1, max_size=40
)


@pytest.mark.spark
@given(st.lists(words_st, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None)
def test_repetition_stats_matches_python_mirror(spark, docs_words):
    from bricolage_spark.operators.textual import repetition_stats

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    out = {
        r.doc_id: r
        for r in repetition_stats(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    for i, ws in enumerate(docs_words):
        n = len(ws)
        bi = list(zip(ws, ws[1:]))
        tri = list(zip(ws, ws[1:], ws[2:]))
        r = out[i]
        assert r.n_words == n
        assert r.dup_word_frac == half_up(1.0 - len(set(ws)) / n)
        assert r.dup_bigram_frac == (
            half_up(1.0 - len(set(bi)) / len(bi)) if bi else 0.0
        )
        assert r.dup_trigram_frac == (
            half_up(1.0 - len(set(tri)) / len(tri)) if tri else 0.0
        )
        assert r.mean_word_len == half_up(sum(map(len, ws)) / n)
        assert 0.0 <= r.dup_word_frac <= 1.0


@pytest.mark.spark
@given(st.lists(words_st, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None)
def test_top_word_matches_python_mirror(spark, docs_words):
    from collections import Counter

    from bricolage_spark.operators.textual import top_word

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    out = {
        r.doc_id: r
        for r in top_word(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    for i, ws in enumerate(docs_words):
        c = Counter(ws)
        best_cnt = max(c.values())
        # tie-break: lexicographically largest among max-count words
        best_word = max(w for w, k in c.items() if k == best_cnt)
        r = out[i]
        assert (r.top_word, r.top_cnt, r.n_words) == (best_word, best_cnt, len(ws))
        assert r.top_share == half_up(best_cnt / len(ws))


# ---------------------------------------------------------------------------
# Retrieval / curation operator semantics vs pure-Python mirrors (q60/q64)
# ---------------------------------------------------------------------------


def _bm25_mirror(docs_words, terms, k1=1.2, b=0.75):
    """Reference BM25 in plain Python (same formula, same rounding)."""
    import math

    n_docs = len(docs_words)
    avgdl = sum(len(ws) for ws in docs_words) / n_docs
    df = {t: sum(1 for ws in docs_words if t in ws) for t in terms}
    scores = {}
    for i, ws in enumerate(docs_words):
        s, hit = 0.0, 0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            hit += 1
            idf = math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * len(ws) / avgdl))
        if hit:
            scores[i] = (half_up(s), hit)
    return scores


@pytest.mark.spark
@given(st.lists(words_st, min_size=1, max_size=8), st.integers(0, 5))
@settings(max_examples=8, deadline=None)
def test_bm25_matches_python_mirror(spark, docs_words, seed):
    from bricolage_spark.operators.retrieval import bm25_topk

    # pick query terms from the corpus vocabulary (plus one guaranteed miss)
    vocab = sorted({w for ws in docs_words for w in ws})
    terms = vocab[seed % len(vocab) : seed % len(vocab) + 2] or [vocab[0]]
    q = {"q": " ".join(terms + ["zzznomatch"])}
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    out = bm25_topk(
        spark.createDataFrame(rows, "doc_id long, text string"),
        q,
        "doc_id",
        "text",
        top_k=len(docs_words) + 1,
    ).collect()
    expect = _bm25_mirror(docs_words, list(dict.fromkeys(q["q"].split())))
    got = {r.doc_id: (r.score, r.n_terms_matched) for r in out}
    assert got == expect
    # ranks are 1..N ordered by (score desc, doc_id asc)
    order = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
    assert order == sorted(expect, key=lambda i: (-expect[i][0], i))


@pytest.mark.spark
@given(
    st.lists(words_st, min_size=1, max_size=6),
    st.integers(2, 6),
    st.integers(1, 5),
)
@settings(max_examples=8, deadline=None)
def test_chunking_matches_python_mirror(spark, docs_words, window, stride):
    import math as _m

    from bricolage_spark.operators.curation import chunk_documents

    stride = min(stride, window)  # overlapping or tiling, never gapped
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    out = chunk_documents(
        spark.createDataFrame(rows, "doc_id long, text string"),
        id_col="doc_id",
        text_col="text",
        window=window,
        stride=stride,
    ).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, ws in enumerate(docs_words):
        n = len(ws)
        n_chunks = 1 + _m.ceil(max(n - window, 0) / stride)
        chunks = sorted(by_doc[i], key=lambda r: r.chunk_id)
        assert len(chunks) == n_chunks
        for c in chunks:
            expect_ws = ws[c.chunk_id * stride : c.chunk_id * stride + window]
            assert c.chunk_text == " ".join(expect_ws)
            assert c.n_words_chunk == len(expect_ws)
        # coverage: every word index falls inside some chunk
        covered = set()
        for c in chunks:
            covered.update(range(c.chunk_id * stride, c.chunk_id * stride + c.n_words_chunk))
        assert covered == set(range(n))


# ---------------------------------------------------------------------------
# Bucketed interval join vs the brute-force O(n·m) mirror (q66)
# ---------------------------------------------------------------------------


@pytest.mark.spark
@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=25),
    st.lists(
        st.tuples(st.integers(0, 200), st.integers(0, 60)),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 80),
)
@settings(max_examples=10, deadline=None)
def test_bucketed_interval_join_matches_bruteforce(spark, ts_list, iv_list, width):
    """Any bucket width yields exactly the BETWEEN-join pairs, each once."""
    from bricolage_spark.operators.interval import bucketed_interval_join

    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate(ts_list)], "p_id long, ts long"
    )
    wins = spark.createDataFrame(
        [(j, s, s + l) for j, (s, l) in enumerate(iv_list)],
        "w_id long, s long, e long",
    )
    out = bucketed_interval_join(
        pts, wins, point_ts="ts", start_col="s", end_col="e",
        bucket_width=width,
    ).select("w_id", "p_id").collect()
    got = sorted((r.w_id, r.p_id) for r in out)
    expect = sorted(
        (j, i)
        for j, (s, l) in enumerate(iv_list)
        for i, t in enumerate(ts_list)
        if s <= t < s + l
    )
    assert got == expect  # exactly-once: list equality, not set


# ---------------------------------------------------------------------------
# Char entropy exactness (q63) and packing bin invariant
# ---------------------------------------------------------------------------


@pytest.mark.spark
@given(st.integers(1, 8), st.integers(1, 6))
@settings(max_examples=8, deadline=None)
def test_uniform_char_entropy_is_log2_k(spark, k, reps):
    """A uniform distribution over k distinct chars has exactly log2(k)
    bits of entropy, independent of repetitions."""
    import math as _m

    from bricolage_spark.operators.textual import char_stats

    alphabet = "abcdefgh"[:k]
    text = alphabet * reps
    r = char_stats(
        spark.createDataFrame([(1, text)], "doc_id long, text string"),
        "doc_id",
        "text",
    ).collect()[0]
    assert r.char_entropy == half_up(_m.log2(k))
    assert r.n_distinct_chars == k


@pytest.mark.spark
@given(
    st.lists(st.integers(1, 400), min_size=1, max_size=12),
    st.integers(50, 400),
)
@settings(max_examples=8, deadline=None)
def test_packed_shards_bin_invariant(spark, tmp_path_factory, doc_chars, budget):
    """write_packed_shards: bin b opens only after the running token total
    reached b*budget; every doc lands in exactly one bin."""
    from bricolage_spark.operators.curation import write_packed_shards

    rows = [(i, "g", "x" * c) for i, c in enumerate(doc_chars)]
    out = tmp_path_factory.mktemp("shards")
    packed = write_packed_shards(
        spark.createDataFrame(rows, "doc_id long, lang string, text string"),
        str(out),
        id_col="doc_id",
        text_col="text",
        group_col="lang",
        budget=budget,
    ).collect()
    shards = sorted(packed, key=lambda r: r.bin_id)
    assert sum(r.n_docs for r in shards) == len(doc_chars)
    cum = 0
    for s in shards:
        assert cum >= s.bin_id * budget
        cum += s.n_tokens
    import math as _m

    assert cum == sum(_m.ceil(c / 4) for c in doc_chars)


# ---------------------------------------------------------------------------
# Large-star/small-star connected components vs union-find (q50 hardening)
# ---------------------------------------------------------------------------


@pytest.mark.spark
@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=10, deadline=None)
def test_connected_components_star_matches_union_find(spark, edge_list):
    """Alternating star rounds produce EXACT min-labeled components on
    arbitrary graphs (self-loops, duplicates, any orientation)."""
    from bricolage_spark.operators.graph import connected_components_star

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edge_list:
        nodes |= {a, b}
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # every node that appears in any edge — including self-loop-only
    # nodes, which must come back as singletons
    expect = {x: find(x) for x in sorted(nodes)}
    edges = spark.createDataFrame(edge_list, "id_a bigint, id_b bigint")
    got = {
        r.id: r.component
        for r in connected_components_star(edges, "id_a", "id_b").collect()
    }
    assert got == expect


# ---------------------------------------------------------------------------
# Winnowing guarantee (q79): any shared run of >= w+k-1 tokens shares a
# selected fingerprint (Schleimer et al. theorem 1), and selection is a
# deterministic function of content.
# ---------------------------------------------------------------------------


def _winnow_select(words, k=4, w=4):
    """Reference implementation: rightmost-minimal k-gram hash per window."""
    import hashlib

    def h32(s):
        return int(hashlib.md5(f"79|{s}".encode()).hexdigest()[:8], 16)

    grams = [
        h32(" ".join(words[i : i + k])) for i in range(len(words) - k + 1)
    ]
    sel = set()
    for i in range(len(grams) - w + 1):
        win = grams[i : i + w]
        m = min(win)
        # rightmost occurrence of the minimum
        j = max(idx for idx, v in enumerate(win) if v == m)
        sel.add(grams[i + j])
    return sel


@pytest.mark.spark
@given(
    st.integers(0, 400),
    st.integers(7, 20),
    st.integers(0, 50),
)
@settings(max_examples=8, deadline=None)
def test_winnowing_shared_run_guarantees_shared_fingerprint(
    spark, seed, run_len, pad
):
    """Two docs sharing a run of >= w+k-1 tokens MUST share >= 1 selected
    fingerprint — the scheme's defining theorem, checked through the
    Spark implementation against an independent Python reference."""
    import random

    from bricolage_spark.queries.llm_ops import _WIN_K, _WIN_W

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    shared = [rng.choice(vocab) for _ in range(run_len)]
    noise = lambda n: [rng.choice(vocab) for _ in range(n)]
    doc_a = noise(pad) + shared + noise(3)
    doc_b = noise(7) + shared + noise(pad % 5)
    df = spark.createDataFrame(
        [(1, " ".join(doc_a)), (2, " ".join(doc_b))], "doc_id long, text string"
    )
    # reuse the registered query's selection pipeline up to `win` by
    # running the full query with relaxed caps via the operator pieces:
    sel_a = _winnow_select(doc_a, _WIN_K, _WIN_W)
    sel_b = _winnow_select(doc_b, _WIN_K, _WIN_W)
    assert run_len >= _WIN_W + _WIN_K - 1
    assert sel_a & sel_b, "reference winnowing must share a fingerprint"
    # Spark side: the q79 gram hashes must equal the reference hashes
    # bit-for-bit (the oracle equivalence then carries the guarantee
    # through the window-min selection, which is pure SQL MIN)
    from pyspark.sql import functions as SF

    from bricolage_spark.operators import dedup as DD

    grams = (
        DD.positional_anchors(df, "doc_id", "text", k=_WIN_K)
        .select("doc_id", "pos", DD.hash32(SF.col("anchor"), 79).alias("h"))
        .collect()
    )
    import hashlib

    for r in grams:
        words = (doc_a if r.doc_id == 1 else doc_b)[r.pos - 1 : r.pos - 1 + _WIN_K]
        expect = int(
            hashlib.md5(("79|" + " ".join(words)).encode()).hexdigest()[:8], 16
        )
        assert r.h == expect


# ---------------------------------------------------------------------------
# URL canonicalization properties: idempotence + case-class stability
# ---------------------------------------------------------------------------


_URL_PART = st.sampled_from(
    ["", "www.", "WWW."]
)


@pytest.mark.spark
@given(
    st.sampled_from(["http", "https", "HTTP", "HTTPS"]),
    _URL_PART,
    st.sampled_from(["example.com", "Example.COM", "a-b.org"]),
    st.sampled_from(["", ":443", ":80", ":8080"]),
    st.sampled_from(["", "/", "/A/b", "/x/index.html", "/x//"]),
    st.sampled_from(["", "?a=1", "?b=2&a=1", "?utm_source=x", "?utm_a=1&z=9&a=2"]),
    st.sampled_from(["", "#frag"]),
)
@settings(max_examples=15, deadline=None)
def test_canonical_url_idempotent(spark, scheme, www, host, port, path, qs, frag):
    """canonical(canonical(u)) == canonical(u) for structured URLs — the
    key property that makes the canonical string usable as a dedup KEY
    (re-canonicalizing stored keys never moves them)."""
    from pyspark.sql import functions as SF

    from bricolage_spark.operators.urls import canonical_url

    raw = f"{scheme}://{www}{host}{port}{path}{qs}{frag}"
    df = spark.createDataFrame([(raw,)], "url string")
    once = df.select(canonical_url(SF.col("url")).alias("c")).first().c
    twice = (
        spark.createDataFrame([(once,)], "url string")
        .select(canonical_url(SF.col("url")).alias("c"))
        .first()
        .c
    )
    assert twice == once


@pytest.mark.spark
@given(st.lists(words_st, min_size=1, max_size=6))
@settings(max_examples=8, deadline=None)
def test_hashed_ngram_score_matches_python_mirror(spark, docs_words):
    """Spark classifier == pure-Python mirror of the SAME derivation
    (md5 bucket -> materialized weight -> sigmoid of mean) on arbitrary
    word lists — pins gram multiplicity, the weight table, and rounding."""
    import hashlib
    import math

    from bricolage_spark.operators import textual as T

    def h32(s, seed):
        return int(hashlib.md5(f"{seed}|{s}".encode()).hexdigest()[:8], 16)

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    out = {
        r.doc_id: r
        for r in T.hashed_ngram_score(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    wtab = T._weight_table()
    for i, ws in enumerate(docs_words):
        grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        total = sum(
            wtab[h32(g, T.CLASSIFIER_SEED_BUCKET) % T.CLASSIFIER_BUCKETS]
            for g in grams
        )
        z = T.CLASSIFIER_BIAS + (total / len(grams)) / 1000.0
        want = half_up(1.0 / (1.0 + math.exp(-z)), 6)
        assert out[i].n_grams == len(grams)
        assert abs(out[i].score - want) < 1e-9


@pytest.mark.spark
@given(st.lists(words_st, min_size=2, max_size=6))
@settings(max_examples=8, deadline=None)
def test_temperature_mixture_invariants(spark, docs_words):
    """On arbitrary per-source doc counts: weights sum to ~1, every rate
    is in (0, 1], n_sampled <= n_docs, and with alpha=1 every source's
    rate equals target_frac (proportional mixing is the identity mix)."""
    from bricolage_spark.operators import curation as C

    rows = []
    doc_id = 0
    for s, ws in enumerate(docs_words):
        for _ in range(len(ws)):
            rows.append((doc_id, f"src{s}"))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = C.temperature_mixture(df, "source", "doc_id", alpha=0.5,
                                target_frac=0.5).collect()
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-4
    for r in out:
        assert 0.0 < r.rate <= 1.0
        assert 0 <= r.n_sampled <= r.n_docs
    flat = C.temperature_mixture(df, "source", "doc_id", alpha=1.0,
                                 target_frac=0.5).collect()
    for r in flat:
        assert abs(r.rate - 0.5) < 1e-6, r


@pytest.mark.spark
@given(st.lists(words_st, min_size=1, max_size=5))
@settings(max_examples=8, deadline=None)
def test_code_signals_matches_python_mirror(spark, docs_words):
    from bricolage_spark.operators import textual as T

    # salt some docs with code punctuation so the ratio branch is exercised
    rows = [
        (i, " ".join(ws) + ("; {x}" if i % 2 else ""))
        for i, ws in enumerate(docs_words)
    ]
    out = {
        r.doc_id: r
        for r in T.code_signals(
            spark.createDataFrame(rows, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    for i, text in rows:
        n = len(text)
        cc = sum(text.count(ch) for ch in T.CODE_CHARS)
        want = half_up(cc / n, 6) if n else 0.0
        assert out[i].n_chars == n
        assert out[i].code_char_ratio == want
        assert out[i].is_code == (want > T.CODE_RATIO_THRESHOLD)


# ---------------------------------------------------------------------------
# BPE merge induction / semantic decon vs pure-Python mirrors (q95/q96)
# ---------------------------------------------------------------------------


def _bpe_mirror(docs_words):
    """Reference symbol-pair counting in plain Python."""
    from collections import Counter

    wc = Counter(w for ws in docs_words for w in ws if w)
    pairs = Counter()
    for w, c in wc.items():
        syms = list(w) + ["</w>"]
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += c
    return dict(pairs)


@pytest.mark.spark
@given(st.lists(words_st, min_size=1, max_size=8))
@settings(max_examples=8, deadline=None)
def test_bpe_merges_match_python_mirror(spark, docs_words):
    from bricolage_spark.operators.textual import bpe_merge_candidates

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    expect = _bpe_mirror(docs_words)
    out = bpe_merge_candidates(
        spark.createDataFrame(rows, "doc_id long, text string"),
        "doc_id",
        "text",
        top_n=len(expect) + 1,
    ).collect()
    got = {(r.s1, r.s2): r.pair_count for r in out}
    assert got == expect
    # ordering: count desc, then (s1, s2) asc
    keys = [(r.s1, r.s2) for r in out]
    assert keys == sorted(expect, key=lambda k: (-expect[k], k))


def _bpe_train_mirror(docs_words, n_merges):
    """Independent reference ITERATIVE BPE trainer (Sennrich et al.) in
    plain Python: re-count pair frequencies after every merge; tie-break
    pinned to count DESC then (s1, s2) ASC; merges apply as a greedy
    left-to-right non-overlapping scan; stop early when no pair remains."""
    from collections import Counter

    wc = Counter(w for ws in docs_words for w in ws if w)
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        bc = max(pairs.values())
        best = min(k for k, v in pairs.items() if v == bc)
        merges.append((rank, best[0], best[1], bc))
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(syms[i] + syms[i + 1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges


# words up to 6 chars over a 2-letter alphabet: maximizes consecutive
# pair repeats (banana/abab-class words), where single-sentinel replace
# application diverged from the greedy symbol scan (round-9 review
# finding — the ≤3-char words_st could never generate the pattern)
bpe_words_st = st.lists(
    st.text(alphabet="ab", min_size=1, max_size=6), min_size=1, max_size=6
)


@pytest.mark.spark
@given(bpe_words_st, st.integers(1, 8))
@settings(max_examples=5, deadline=None)
def test_bpe_learn_merges_matches_reference_trainer(spark, docs_words, n_merges):
    """TRUE iterative induction (q95, round-9): BOTH trainer tiers —
    the DISTRIBUTED Spark loop (driver_vocab_max=0 forces it;
    rematerialize_every=3 exercises the vocab re-fold path) and the
    metadata-sized driver tier — equal the independent pure-Python
    Sennrich trainer merge-for-merge on arbitrary corpora: re-counted
    frequencies (merge t sees the symbols merges 1..t-1 created), the
    pinned tie-break, and early exhaustion."""
    from bricolage_spark.operators.textual import bpe_learn_merges

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = _bpe_train_mirror(docs_words, n_merges)
    distributed = bpe_learn_merges(
        df,
        "doc_id",
        "text",
        n_merges=n_merges,
        rematerialize_every=3,
        driver_vocab_max=0,
    )
    assert distributed == want
    local = bpe_learn_merges(df, "doc_id", "text", n_merges=n_merges)
    assert local == want


vec_st = st.lists(
    st.floats(min_value=-4, max_value=4, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
    min_size=3,
    max_size=3,
).filter(lambda v: any(abs(x) > 0.01 for x in v))


@pytest.mark.spark
@given(
    st.lists(vec_st, min_size=1, max_size=6),
    st.lists(vec_st, min_size=1, max_size=3),
)
@settings(max_examples=8, deadline=None)
def test_max_sim_to_reference_matches_python_mirror(spark, corpus, ref):
    import math

    from bricolage_spark.operators.similarity import max_sim_to_reference

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return half_up(d / (na * nb))

    cdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(corpus)],
        "vec_id long, embedding array<float>",
    )
    rdf = spark.createDataFrame(
        [(100 + i, v) for i, v in enumerate(ref)],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: r for r in
           max_sim_to_reference(cdf, rdf, threshold=0.5).collect()}
    for i, v in enumerate(corpus):
        # the float32 round-trip through array<float> perturbs the 4dp
        # rounding boundary: recompute the mirror on the float32 values
        import struct as _s
        f32 = lambda xs: [_s.unpack("f", _s.pack("f", x))[0] for x in xs]
        sims = [(cos(f32(v), f32(rv)), 100 + j) for j, rv in enumerate(ref)]
        best = max(s for s, _ in sims)
        nn = min(j for s, j in sims if s == best)
        r = out[i]
        assert r.max_sim == pytest.approx(best, abs=1.5e-4)
        if all(abs(best - s) > 3e-4 for s, j in sims if j != nn):
            assert r.nn_ref_id == nn
        assert r.keep == (r.max_sim < 0.5)


# ---------------------------------------------------------------------------
# round-7 post-window operators: pagerank, DSIR, drift, salient terms
# ---------------------------------------------------------------------------

edge_st = st.lists(
    st.tuples(st.integers(0, 8), st.integers(0, 8)),
    min_size=1,
    max_size=16,
).map(lambda es: [(a, b) for a, b in es if a != b])


@pytest.mark.spark
@given(edge_st, st.integers(1, 4))
@settings(max_examples=6, deadline=None)
def test_pagerank_matches_numpy_on_random_graphs(spark, edges, iters):
    """On arbitrary digraphs (self-loops stripped, dangling nodes
    common), pagerank equals an independent power-iteration mirror to
    1e-12 and conserves total rank mass exactly."""
    if not edges:
        return
    from bricolage_spark.operators.graph import pagerank

    df = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r.id: r.rank for r in pagerank(df, iterations=iters).collect()
    }

    ids = sorted({v for e in edges for v in e})
    n, d = len(ids), 0.85
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    r = {v: 1.0 / n for v in ids}
    for _ in range(iters):
        dang = sum(r[v] for v in ids if v not in out)
        nxt = {v: (1.0 - d) / n + d * dang / n for v in ids}
        for s, ts in out.items():
            w = r[s] / len(ts)
            for t in ts:
                nxt[t] += d * w
        r = nxt
    assert set(got) == set(ids)
    for v in ids:
        assert abs(got[v] - r[v]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


@pytest.mark.spark
@given(st.lists(words_st, min_size=2, max_size=8))
@settings(max_examples=6, deadline=None)
def test_dsir_importance_matches_python_mirror_random(spark, docs_words):
    """DSIR weights on arbitrary corpora match the pure-Python recipe
    (hashed uni+bigram counts, add-one smoothing, summed log ratio);
    target docs never appear in the output."""
    import hashlib
    import math

    from pyspark.sql import functions as F

    from bricolage_spark.operators.textual import (
        DSIR_BUCKETS,
        DSIR_SEED,
        dsir_importance,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    targets = {i for i, _ in rows if i % 2 == 0}
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.dsir_logweight)
        for r in dsir_importance(
            df, "doc_id", "text", F.col("doc_id") % 2 == 0
        ).collect()
    }
    assert set(got).isdisjoint(targets)

    def grams(ws):
        return list(ws) + [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def bucket(g):
        h = hashlib.md5(f"{DSIR_SEED}|{g}".encode()).hexdigest()[:8]
        return int(h, 16) % DSIR_BUCKETS

    ct, cr = {}, {}
    for i, ws in enumerate(docs_words):
        d = ct if i in targets else cr
        for g in grams(ws):
            d[bucket(g)] = d.get(bucket(g), 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    for i, ws in enumerate(docs_words):
        if i in targets:
            continue
        gs = grams(ws)
        w = sum(
            math.log((ct.get(bucket(g), 0) + 1.0) / (tt + DSIR_BUCKETS))
            - math.log((cr.get(bucket(g), 0) + 1.0) / (tr + DSIR_BUCKETS))
            for g in gs
        )
        assert got[i][0] == len(gs), i
        assert abs(got[i][1] - half_up(w)) < 1e-9, i


@pytest.mark.spark
@given(st.lists(words_st, min_size=2, max_size=8))
@settings(max_examples=6, deadline=None)
def test_unigram_js_drift_symmetry_and_bounds(spark, docs_words):
    """JS divergence is SYMMETRIC: swapping the slice flag leaves
    js_divergence identical (n_a/n_b swap), and every value lands in
    [0, ln 2]."""
    import math

    from pyspark.sql import functions as F

    from bricolage_spark.operators.textual import unigram_js_drift

    rows = [(i, "g", " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    a = unigram_js_drift(df, "source", "text", F.col("doc_id") % 2 == 0).collect()
    b = unigram_js_drift(df, "source", "text", F.col("doc_id") % 2 != 0).collect()
    (ra,), (rb,) = a, b
    assert ra.js_divergence == rb.js_divergence
    assert (ra.n_a, ra.n_b) == (rb.n_b, rb.n_a)
    assert 0.0 <= ra.js_divergence <= math.log(2) + 1e-9


@pytest.mark.spark
@given(st.lists(words_st, min_size=2, max_size=6), st.integers(1, 4))
@settings(max_examples=6, deadline=None)
def test_salient_terms_rank_invariants(spark, docs_words, top_n):
    """Ranks are contiguous 1..k per group (k <= top_n), scores are
    non-increasing within a group, ties ordered by term, and terms
    present in EVERY group score exactly 0."""
    from pyspark.sql import functions as F

    from bricolage_spark.operators.textual import (
        salient_terms,
        split_word_counts,
    )

    rows = [(i, f"g{i % 2}", " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    counts = split_word_counts(
        df, "source", "text", F.col("doc_id") % 2 == 0
    ).persist()
    try:
        out = salient_terms(counts, "source", top_n=top_n).collect()
        n_groups = counts.select("source").distinct().count()
        by_group: dict = {}
        for r in out:
            by_group.setdefault(r.source, []).append(r)
        for g, rs in by_group.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= top_n
            for x, y in zip(rs, rs[1:]):
                assert x.tfidf > y.tfidf or (
                    x.tfidf == y.tfidf and x.term < y.term
                )
            for r in rs:
                if r.n_groups_with_term == n_groups:
                    assert r.tfidf == 0.0
    finally:
        counts.unpersist(blocking=False)


@pytest.mark.spark
def test_hashed_ngram_score_null_text_parity(spark):
    """Regression (round-7 advice): NULL-text docs must be DROPPED by
    hashed_ngram_score — the q83 DuckDB oracle's UNNEST over a NULL word
    list yields no rows, so a Spark row for a NULL doc would be a latent
    hash-parity divergence the moment a fixture gains NULL text. Empty
    (non-NULL) text still scores: split('') is [''], one gram."""
    from bricolage_spark.operators import textual as T

    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    out = T.hashed_ngram_score(df, "doc_id", "text")
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 3]
    keep = df.where(T.hashed_ngram_keep("text")).collect()
    assert all(r.doc_id != 2 for r in keep)


def _bpe_mirror_sym(words):
    """Python mirror of bpe_symbol_string over a word list (the
    double-sentinel representation: every symbol wrapped in its own
    sentinel pair, so replace == the greedy symbol scan)."""
    from bricolage_spark.operators.textual import BPE_SEP as P

    norm = " ".join(words)
    s = "".join(P + ch + P for ch in norm)
    s = s.replace(P + " " + P, P + "</w>" + P)
    return s + P + "</w>" + P


def _bpe_mirror_apply(s, merges):
    from bricolage_spark.operators.textual import BPE_SEP as P

    for a, b in merges:
        s = s.replace(P + a + P + P + b + P, P + a + b + P)
    return s


def _bpe_mirror_count(s):
    from bricolage_spark.operators.textual import BPE_SEP as P

    return s.count(P) // 2


@pytest.mark.spark
@given(bpe_words_st)
@settings(max_examples=6, deadline=None)
def test_bpe_roundtrip_induce_then_encode(spark, docs_words):
    """q95 -> q102 round trip on arbitrary word lists: induce merges
    with bpe_merge_candidates, encode with bpe_encode, and pin every
    output column against a pure-Python mirror of the same greedy
    left-to-right merge scan (str.replace == Spark StringReplace ==
    the oracle's replace(): all non-overlapping left-to-right)."""
    from bricolage_spark.operators import textual as T

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs_words)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = [
        (r.s1, r.s2)
        for r in T.bpe_merge_candidates(df, "doc_id", "text", top_n=5).collect()
    ]
    out = {r.doc_id: r for r in T.bpe_encode(df, "doc_id", "text", merges).collect()}
    assert set(out) == set(range(len(docs_words)))
    for i, ws in enumerate(docs_words):
        base = _bpe_mirror_sym(ws)
        enc = _bpe_mirror_apply(base, merges)
        toks = [t for t in enc.split("\x01") if t != ""]
        r = out[i]
        assert r.n_symbols == _bpe_mirror_count(base)
        assert r.n_tokens == _bpe_mirror_count(enc) == len(toks)
        assert r.n_merged == r.n_symbols - r.n_tokens
        assert r.token_preview == " ".join(toks[:8])
        # merges only ever shrink, never below one token per word
        assert len(ws) <= r.n_tokens <= r.n_symbols


@pytest.mark.spark
def test_bpe_encode_null_and_empty_text(spark):
    """NULL text is dropped (nothing to encode — hashed_ngram_score's
    contract); empty text encodes as the lone </w> symbol."""
    from bricolage_spark.operators import textual as T

    df = spark.createDataFrame(
        [(1, "aa aa"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in T.bpe_encode(df, "doc_id", "text", [("a", "a")]).collect()}
    assert set(out) == {1, 3}
    assert out[3].n_symbols == 1 and out[3].n_tokens == 1
    assert out[3].token_preview == "</w>"
    # "aa aa": symbols a a </w> a a </w> (6); merge (a,a) -> aa </w> aa </w>
    assert out[1].n_symbols == 6 and out[1].n_tokens == 4
    assert out[1].token_preview == "aa </w> aa </w>"


@pytest.mark.spark
def test_pack_and_histogram_accept_bpe_token_counts(spark):
    """pack_sequences / length_histogram over REAL BPE token counts (the
    round-7 verdict's rewiring ask): the packer bins on the encoded
    n_tokens column, and bins never exceed the budget except for a
    single over-budget document."""
    from pyspark.sql import functions as F

    from bricolage_spark.operators import textual as T

    rows = [(i, "en" if i % 2 else "de", ("lorem ipsum dolor sit amet " * (1 + i % 7)).strip()) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    merges = [
        (r.s1, r.s2)
        for r in T.bpe_merge_candidates(df, "doc_id", "text", top_n=10).collect()
    ]
    enc = T.bpe_encode(df, "doc_id", "text", merges).join(
        df.select("doc_id", "lang"), "doc_id"
    )
    packed = T.pack_sequences(
        enc.select("doc_id", "lang", F.col("n_tokens").alias("toks")),
        F.col("toks"),
        budget=64,
        partition_col="lang",
        order_col="doc_id",
    ).collect()
    from collections import defaultdict

    bins = defaultdict(int)
    for r in packed:
        assert r.n_tokens == r.toks
        bins[(r.lang, r.bin_id)] += r.n_tokens
    for (lang, b), total in bins.items():
        # offset binning: every doc STARTS inside its bin, so a bin
        # exceeds the budget only by however far its last doc runs over
        last = max(
            (r for r in packed if (r.lang, r.bin_id) == (lang, b)),
            key=lambda r: r.doc_id,
        )
        assert total - last.n_tokens < 64
    hist = T.length_histogram(enc, F.col("n_tokens"), "lang").collect()
    assert sum(h.n_docs for h in hist) == 40
    for h in hist:
        assert h.bucket_lo == 2 ** h.bucket
        assert h.total_tokens >= h.n_docs * h.bucket_lo


@pytest.mark.spark
@given(
    st.lists(st.integers(1, 2000), min_size=1, max_size=8),
    st.one_of(
        st.integers(1_000, 200_000),
        # production-scale budgets: the downward 12-dp weight snap is
        # what keeps sum(floor(w*B)) <= B here — HALF_UP rounding could
        # overshoot by k*5e-13*B (~thousands of tokens at 10^13)
        st.integers(10**11, 10**13),
    ),
)
@settings(max_examples=8, deadline=None)
def test_epoch_plan_invariants(spark, source_sizes, budget):
    """q108's allocation on arbitrary source shapes AND budgets up to
    10^13 tokens: weights sum to ~1, floor'd targets never exceed the
    budget in total, epochs equal target/available, the oversampled
    flag fires exactly past the threshold, and equal-sized sources get
    equal allocations."""
    from pyspark.sql import functions as F

    from bricolage_spark.operators.curation import epoch_plan

    rows = []
    doc_id = 0
    for s, n in enumerate(source_sizes):
        for _ in range(n):
            rows.append((doc_id, f"src{s}", 40))  # 10 tokens per doc
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    out = epoch_plan(
        df,
        "source",
        F.ceil(F.col("n_chars") / 4.0).cast("bigint"),
        budget_tokens=budget,
        max_epochs=4.0,
    ).collect()
    assert len(out) == len(source_sizes)
    assert abs(sum(r.weight for r in out) - 1.0) < 1e-4
    assert sum(r.target_tokens for r in out) <= budget
    by_src = {r.source: r for r in out}
    for s, n in enumerate(source_sizes):
        r = by_src[f"src{s}"]
        assert r.n_docs == n and r.n_tokens == 10 * n
        # HALF_UP mirror, not approx: hypothesis found a ratio landing
        # exactly on a 4dp half-tie (0.04845), where the engine's
        # F.round gives 0.0485 and a ±5e-5 approx band just misses
        assert r.epochs == half_up(r.target_tokens / r.n_tokens)
        assert r.oversampled == (r.target_tokens / r.n_tokens > 4.0)
    sizes = {}
    for r in out:
        sizes.setdefault(r.n_tokens, set()).add(r.target_tokens)
    for targets in sizes.values():
        assert len(targets) == 1  # equal sources, equal allocation


@pytest.mark.spark
@given(
    st.lists(st.integers(0, 2000), min_size=1, max_size=8),
    st.integers(100, 500_000),
)
@settings(max_examples=8, deadline=None)
def test_unimax_plan_invariants(spark, source_sizes, budget):
    """q111's water-filling on arbitrary source shapes and budgets,
    pinned source-for-source to a pure-Python transliteration of the
    closed form, plus the UniMax invariants: never past the cap, sum of
    targets <= budget with a remainder < #unsaturated, every
    unsaturated source at the SAME level, and every saturated capacity
    <= that level (uniform-up-to-cap)."""
    import math

    from pyspark.sql import functions as F

    from bricolage_spark.operators.curation import unimax_plan

    max_epochs = 2.0
    rows = []
    doc_id = 0
    for s, n in enumerate(source_sizes):
        for _ in range(max(1, n)):
            # n == 0 -> one empty doc, a zero-token source
            rows.append((doc_id, f"src{s}", 40 if n else 0))
            doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars int")
    out = {
        r.source: r
        for r in unimax_plan(
            df,
            "source",
            F.ceil(F.col("n_chars") / 4.0).cast("bigint"),
            budget_tokens=budget,
            max_epochs=max_epochs,
        ).collect()
    }

    # pure-python closed form (the docstring's definition, transliterated)
    toks = {f"src{s}": 10 * n for s, n in enumerate(source_sizes)}
    caps = {s: math.floor(t * max_epochs) for s, t in toks.items()}
    sat = {}
    for s, c in caps.items():
        S = sum(cj for cj in caps.values() if cj <= c)
        G = sum(1 for cj in caps.values() if cj > c)
        sat[s] = (S + c * G) <= budget
    SS = sum(caps[s] for s in caps if sat[s])
    NU = sum(1 for s in caps if not sat[s])
    L = (budget - SS) // NU if NU else None
    for s in caps:
        r = out[s]
        want = caps[s] if sat[s] else L
        assert r.saturated == sat[s], (s, budget, caps)
        assert r.target_tokens == want, (s, budget, caps)
        assert r.n_tokens == toks[s] and r.capacity == caps[s]
        # invariants
        assert r.target_tokens <= r.capacity
        if toks[s]:
            assert r.epochs <= max_epochs + 1e-9
        else:
            assert r.target_tokens == 0 and r.epochs == 0.0
    assert sum(r.target_tokens for r in out.values()) <= budget
    if NU:
        # the unallocated remainder is exactly the integer-division
        # residue, strictly under one token per unsaturated source
        leftover = budget - sum(r.target_tokens for r in out.values())
        assert leftover == (budget - SS) % NU and leftover < NU
        # every saturated capacity sits at or below the uniform level
        for s in caps:
            if sat[s]:
                assert caps[s] <= L


# ---------------------------------------------------------------------------
# r12-reshaped dedup operators vs pure-Python mirrors: the min_by in-batch
# stage of incremental_dedup, and the capped LSH bucket expansion — the two
# semantics the r12 plan changes touched (and the oracles rely on)
# ---------------------------------------------------------------------------


def _norm(t: str) -> str:
    import re as _re

    return _re.sub(r"\s+", " ", t.lower()).strip()


@pytest.mark.spark
@given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(["a b c", "a  B c", "x y", "p q r s"])),
        min_size=1,
        max_size=10,
    ),
    st.sets(st.sampled_from(["a b c", "x y", "zz ww"]), max_size=2),
)
@settings(max_examples=8, deadline=None)
def test_incremental_dedup_matches_python_mirror(spark, texts, reg_texts):
    """The r12 min_by reshape: per normalized-content digest keep the
    min-id row, drop NULL texts explicitly, anti-join the registry —
    bit-for-bit the q67 oracle's semantics on arbitrary inputs."""
    import hashlib

    from bricolage_spark.operators import dedup as D

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    reg_rows = [
        (hashlib.md5(_norm(t).encode()).hexdigest(),) for t in sorted(reg_texts)
    ]
    reg = (
        spark.createDataFrame(reg_rows, "content_hash string")
        if reg_rows
        else None
    )
    novel, digests = D.incremental_dedup(df, reg, "doc_id", "text")
    got = {(r.doc_id, r.content_hash) for r in novel.collect()}

    # python mirror
    first: dict = {}
    for i, t in enumerate(texts):
        if t is None:
            continue
        h = hashlib.md5(_norm(t).encode()).hexdigest()
        if h not in first:
            first[h] = i
    reg_set = {h for (h,) in reg_rows}
    want = {(i, h) for h, i in first.items() if h not in reg_set}
    assert got == want
    assert {r.content_hash for r in digests.collect()} == {h for _i, h in want}


@pytest.mark.spark
@given(
    st.lists(st.integers(0, 3), min_size=2, max_size=14),
    st.integers(2, 5),
)
@settings(max_examples=8, deadline=None)
def test_lsh_cap_matches_python_mirror(spark, sig_seeds, cap):
    """The capped bucket expansion (q33's production path and the
    [2, cap] HAVING filter its oracles embed): buckets outside
    [2, cap] emit NO pairs, sub-cap buckets emit exactly their
    all-pairs — verified against a pure-Python banding mirror on
    arbitrary (colliding) signature tables."""
    import hashlib
    from itertools import combinations

    from bricolage_spark.operators import dedup as D

    bands, rpb = 4, 4
    # seed s determines all 16 hash values -> docs with equal seeds are
    # full-signature duplicates (worst-case bucket collisions)
    rows = [
        tuple([i] + [s * 100 + j // rpb for j in range(16)])
        for i, s in enumerate(sig_seeds)
    ]
    sigs = spark.createDataFrame(
        rows, "id long, " + ", ".join(f"h{i} long" for i in range(16))
    )
    got = {
        (r.id_a, r.id_b)
        for r in D.lsh_candidate_pairs(
            sigs, "id", bands=bands, rows_per_band=rpb, max_bucket=cap
        ).collect()
    }

    # python mirror of band_buckets + the [2, cap] whole-bucket filter
    buckets: dict = {}
    for row in rows:
        i, hs = row[0], row[1:]
        for b in range(bands):
            key = (
                b,
                hashlib.md5(
                    ",".join(str(h) for h in hs[b * rpb : (b + 1) * rpb]).encode()
                ).hexdigest(),
            )
            buckets.setdefault(key, []).append(i)
    want = set()
    for members in buckets.values():
        if 2 <= len(members) <= cap:
            want |= set(combinations(sorted(members), 2))
    assert got == want
