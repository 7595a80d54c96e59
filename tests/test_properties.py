"""Property tests (hypothesis) for the pure kernels where a
reference implementation exists in a few lines of Python — the
engine's expression semantics must agree with it on arbitrary inputs,
not just the corpus examples."""

from __future__ import annotations

import math

import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)


# -- substring: fold evaluator vs the documented byte semantics ----------


@given(
    s=st.text(alphabet="abcdef xyz", max_size=12),
    b=st.integers(-15, 15),
    e=st.integers(-15, 15),
)
@settings(max_examples=300, deadline=None)
def test_substring_fold_matches_python_slice_semantics(s, b, e):
    """_PY_FNS['substring'] (the COMMIT-fold evaluator) must agree
    with the reference semantics: 0-based, negatives from the end,
    start inclusive / stop exclusive, clamped."""
    from ramen_spark.plans.raql import _PY_FNS

    def ref(s, b, e):
        n = len(s)
        bb = max(n + b, 0) if b < 0 else min(b, n)
        ee = max(n + e, 0) if e < 0 else min(e, n)
        return s[bb:ee] if ee > bb else ""

    assert _PY_FNS["substring"](s, b, e) == ref(s, b, e)


# -- wrap_int: 2-complement wraparound vs plain modular arithmetic --------


@pytest.fixture(scope="module")
def _spark():
    from tests.conftest import spark as _s  # reuse session fixture factory

    return None


@given(
    v=st.integers(-(1 << 40), 1 << 40),
    bits=st.sampled_from([8, 16, 24, 32, 40, 48, 56, 64]),
    signed=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_wrap_int_matches_modular_arithmetic(spark, v, bits, signed):
    from pyspark.sql import functions as F

    from ramen_spark.types import wrap_int

    name = f"{'i' if signed else 'u'}{bits}"
    got = (
        spark.range(1)
        .select(wrap_int(F.lit(v), name).alias("x"))
        .collect()[0]["x"]
    )
    m = v % (1 << bits)
    if signed and m >= 1 << (bits - 1):
        m -= 1 << bits
    assert int(got) == m


# -- pass_fpr: convolution vs exact enumeration ---------------------------


@given(
    certs=st.lists(st.floats(0.05, 0.95), min_size=0, max_size=6),
    cand=st.floats(0.05, 0.95),
    max_fpr=st.floats(0.01, 2.0),
)
@settings(max_examples=200, deadline=None)
def test_pass_fpr_matches_exact_enumeration(certs, cand, max_fpr):
    """The Bernoulli convolution in pass_fpr equals brute-force
    enumeration of all junk/real outcomes."""
    import itertools

    from ramen_spark.streaming.alerter import pass_fpr

    now = 100.0
    incidents = [(now - 10.0 - i, c) for i, c in enumerate(certs)]
    got = pass_fpr(max_fpr, incidents, cand, now)

    if not incidents:
        assert got is True
        return
    oldest = min(t for t, _ in incidents)
    max_fp = math.ceil((now - oldest) * max_fpr)
    if max_fp < 1:
        assert got is False
        return
    if max_fp > 1 + len(incidents):
        assert got is True
        return
    ps = [1.0 - c for _, c in incidents] + [1.0 - cand]
    p_more = 0.0
    for outcome in itertools.product([0, 1], repeat=len(ps)):
        if sum(outcome) > max_fp:
            p = 1.0
            for bit, pj in zip(outcome, ps):
                p *= pj if bit else (1.0 - pj)
            p_more += p
    assert got == (p_more <= 0.5 + 1e-12) or abs(p_more - 0.5) < 1e-9


# -- PEEK assembly vs int.from_bytes --------------------------------------


@given(
    data=st.binary(min_size=1, max_size=8),
    endian=st.sampled_from(["big", "little"]),
)
@settings(max_examples=60, deadline=None)
def test_peek_matches_int_from_bytes(spark, data, endian):
    from ramen_spark.plans.raql import compile_operation

    w = len(data)
    bits = w * 8
    if bits not in (8, 16, 32, 64):
        data = data.ljust({1: 1, 2: 2, 3: 4, 4: 4}.get(w, 8), b"\0")
        w = len(data)
        bits = w * 8
    # printable-safe escape into a RaQL string literal
    lit = "".join(f"\\x{b:02x}" for b in data)
    out = compile_operation(
        f'select peek u{bits} {endian} endian "{lit}" as v',
        spark.range(1),
    ).collect()[0]["v"]
    assert int(out) == int.from_bytes(data, endian)


# -- graphite glob translation vs fnmatch --------------------------------


@given(
    pat=st.text(alphabet="abc*?.[]0-9", max_size=8),
    val=st.text(alphabet="abc.019", max_size=8),
)
@settings(max_examples=300, deadline=None)
def test_glob_regex_matches_fnmatch(pat, val):
    import fnmatch
    import re

    from ramen_spark.api import _glob_to_java_regex

    try:
        jre = re.compile(_glob_to_java_regex(pat))
    except re.error:
        return  # degenerate [ patterns — fnmatch treats them literally
    try:
        want = fnmatch.fnmatchcase(val, pat)
    except re.error:
        return
    assert bool(jre.match(val) and jre.match(val).end() == len(val)) == want


# -- greedy packing invariants (operators.packing, pure recurrence) -------


@given(
    toks=st.lists(st.integers(0, 700), min_size=1, max_size=60),
    budget=st.integers(1, 600),
)
@settings(max_examples=200, deadline=None)
def test_greedy_packing_invariants(toks, budget):
    """The per-shard greedy recurrence (operators.packing.pack): every
    pack's token sum stays within budget unless it holds a single
    oversize doc; pack ids are contiguous from 0; doc order is
    preserved within packs."""
    seqs = []
    seq, cum = 0, 0
    for i, n in enumerate(toks):
        if i == 0:
            cum = n
        elif cum + n > budget:
            seq += 1
            cum = n
        else:
            cum += n
        seqs.append(seq)

    assert seqs[0] == 0
    assert all(b - a in (0, 1) for a, b in zip(seqs, seqs[1:]))  # contiguous
    from collections import defaultdict

    packs = defaultdict(list)
    for n, s_ in zip(toks, seqs):
        packs[s_].append(n)
    for members in packs.values():
        assert sum(members) <= budget or len(members) == 1


def test_like_fold_matches_spark_ilike_exhaustive(spark):
    """The fold's Python LIKE (plans.raql._like_regex) must agree with
    Spark's ilike over the exhaustive small-alphabet space (patterns
    ≤3 chars over {a, %, _, b}, inputs ≤3 chars over {a, b, A}) — one
    batched Spark evaluation, no per-example queries."""
    import itertools
    import re as _re

    from pyspark.sql import functions as F

    from ramen_spark.plans.raql import _like_regex

    pats = [
        "".join(t)
        for n in range(0, 4)
        for t in itertools.product("a%_b", repeat=n)
    ]
    vals = [
        "".join(t)
        for n in range(0, 4)
        for t in itertools.product("abA", repeat=n)
    ]
    rows = [(v, p_) for v in vals for p_ in pats]
    df = spark.createDataFrame(rows, "s string, pat string")
    got_rows = df.select(
        "s", "pat", F.expr("s ilike pat").alias("m")
    ).collect()
    for r in got_rows:
        mine = (
            _re.fullmatch(
                _like_regex(r["pat"]), r["s"], _re.IGNORECASE | _re.DOTALL
            )
            is not None
        )
        assert mine == r["m"], (r["s"], r["pat"], mine, r["m"])


def test_aes_inclusion_probability_proportional_to_weight():
    """Statistical validation of the A-ES scheme weighted_sample
    implements (pure Python twin of the operator's key — the operator
    equals this gold exactly, pinned in test_sketch_rangejoin): over
    many seeds, an item's inclusion frequency in a size-n sample
    tracks the Efraimidis–Spirakis theory. For n=1 the theory is
    exact: P(pick i) = w_i / Σw. Items with weight 4:2:1 must land in
    those proportions (±5 abs pp at 3000 seeds), and the uniform case
    must be uniform."""
    import hashlib
    import math

    def skey(doc_id, w, seed):
        h = int(
            hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()[:12], 16
        )
        u = (h + 1) / float(1 << 48)
        return math.log(u) / w

    weights = {0: 4.0, 1: 4.0, 2: 2.0, 3: 2.0, 4: 1.0, 5: 1.0}
    total = sum(weights.values())
    wins = {i: 0 for i in weights}
    n_seeds = 3000
    for seed in range(n_seeds):
        best = max(weights, key=lambda i: (skey(i, weights[i], seed), -i))
        wins[best] += 1
    for i, w in weights.items():
        got = wins[i] / n_seeds
        want = w / total
        assert abs(got - want) < 0.05, (i, got, want)
    # uniform weights -> uniform inclusion at n=2 of 6 (P = 2/6 each)
    incl = {i: 0 for i in range(6)}
    for seed in range(n_seeds):
        order = sorted(range(6), key=lambda i: (-skey(i, 1.0, seed), i))
        for i in order[:2]:
            incl[i] += 1
    for i in range(6):
        assert abs(incl[i] / n_seeds - 2 / 6) < 0.05, (i, incl[i] / n_seeds)
