"""Property-based check: random write/delete/purge sequences against an
in-python model of natural-key upsert semantics (beyond the reference's
test strategy — SURVEY §5 notes it has no property tests)."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tanker_spark import View, connect, create_tables

SCHEMA = """
- table: item
  columns:
    sku: varchar
    qty: integer
    note: varchar
  key: [sku]
"""

SKUS = ["a", "b", "c", "d"]

op_st = st.one_of(
    st.tuples(
        st.just("write"),
        st.lists(
            st.tuples(
                st.sampled_from(SKUS),
                st.integers(0, 9),
                st.sampled_from(["x", "y", None]),
            ),
            min_size=1, max_size=3, unique_by=lambda t: t[0],
        ),
    ),
    st.tuples(st.just("delete"), st.sampled_from(SKUS)),
    st.tuples(
        st.just("purge"),
        st.lists(
            st.tuples(
                st.sampled_from(SKUS),
                st.integers(0, 9),
                st.sampled_from(["x", "y", None]),
            ),
            min_size=1, max_size=2, unique_by=lambda t: t[0],
        ),
    ),
)


@pytest.mark.slow
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(ops=st.lists(op_st, min_size=1, max_size=5))
def test_upsert_model(spark, tmp_path_factory, ops):
    root = str(tmp_path_factory.mktemp("prop"))
    model = {}
    with connect({"root": root, "schema": SCHEMA, "spark": spark}):
        create_tables()
        view = View("item", ["sku", "qty", "note"])
        for op in ops:
            if op[0] == "write":
                rows = op[1]
                view.write(list(rows))
                for sku, qty, note in rows:
                    model[sku] = (sku, qty, note)
            elif op[0] == "delete":
                sku = op[1]
                view.delete(filters="(= sku {})", args=[sku])
                model.pop(sku, None)
            else:  # purge: rows absent from input are deleted
                rows = op[1]
                view.write(list(rows), purge=True)
                model = {}
                for sku, qty, note in rows:
                    model[sku] = (sku, qty, note)
        res = sorted(view.read().all())
        assert res == sorted(model.values())


# ---------------------------------------------------------------------------
# read-path property: random predicate trees vs a python model with SQL
# three-valued logic — pins the filter compiler's NULL semantics beyond
# the hand-written cases
# ---------------------------------------------------------------------------

ROWS = [
    ("a", 1, "x"), ("b", 2, "y"), ("c", 3, None), ("d", 4, "x"),
    ("e", 5, None), ("f", 6, "y"), ("g", 7, "z"), ("h", 8, "x"),
]


def _atom_exprs():
    return st.one_of(
        st.tuples(st.just("cmp"), st.sampled_from(["=", "!=", ">", "<",
                                                   ">=", "<="]),
                  st.integers(0, 9)),
        st.tuples(st.just("note_eq"), st.sampled_from(["x", "y", "z"])),
        st.just(("note_null",)),
        st.just(("note_notnull",)),
        st.tuples(st.just("in"), st.lists(st.integers(0, 9),
                                          min_size=1, max_size=3)),
    )


pred_st = st.recursive(
    _atom_exprs(),
    lambda kids: st.one_of(
        st.tuples(st.just("and"), kids, kids),
        st.tuples(st.just("or"), kids, kids),
        st.tuples(st.just("not"), kids),
    ),
    max_leaves=4,
)


def _to_sexpr(p):
    kind = p[0]
    if kind == "cmp":
        return "(%s qty %d)" % (p[1], p[2])
    if kind == "note_eq":
        return '(= note "%s")' % p[1]
    if kind == "note_null":
        return "(is note null)"
    if kind == "note_notnull":
        return "(isnot note null)"
    if kind == "in":
        return "(in qty %s)" % " ".join(str(v) for v in p[1])
    if kind == "not":
        return "(not %s)" % _to_sexpr(p[1])
    return "(%s %s %s)" % (kind, _to_sexpr(p[1]), _to_sexpr(p[2]))


def _eval(p, qty, note):
    """Kleene three-valued evaluation (None = SQL NULL/UNKNOWN)."""
    kind = p[0]
    if kind == "cmp":
        op, k = p[1], p[2]
        import operator as _op
        f = {"=": _op.eq, "!=": _op.ne, ">": _op.gt, "<": _op.lt,
             ">=": _op.ge, "<=": _op.le}[op]
        return f(qty, k)
    if kind == "note_eq":
        return None if note is None else note == p[1]
    if kind == "note_null":
        return note is None
    if kind == "note_notnull":
        return note is not None
    if kind == "in":
        return qty in p[1]
    if kind == "not":
        v = _eval(p[1], qty, note)
        return None if v is None else not v
    a, b = _eval(p[1], qty, note), _eval(p[2], qty, note)
    if kind == "and":
        if a is False or b is False:
            return False
        if a is None or b is None:
            return None
        return True
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return False


@pytest.mark.slow
@settings(
    max_examples=20, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(pred=pred_st)
@pytest.mark.slow
def test_filter_three_valued_logic(spark, tmp_path_factory, pred):
    root = str(tmp_path_factory.mktemp("prop_read"))
    with connect({"root": root, "schema": SCHEMA, "spark": spark}):
        create_tables()
        view = View("item", ["sku", "qty", "note"])
        view.write(list(ROWS))
        got = sorted(r[0] for r in view.read(_to_sexpr(pred)).all())
        want = sorted(
            sku for sku, qty, note in ROWS
            if _eval(pred, qty, note) is True
        )
        assert got == want, _to_sexpr(pred)


# ---------------------------------------------------------------------------
# operator models: random corpora vs plain-python brute force
# ---------------------------------------------------------------------------

_WORDS = ["aa", "bb", "cc", "dd", "ee"]

doc_st = st.lists(
    st.sampled_from(_WORDS + ["  "]), min_size=1, max_size=8
).map(lambda ws: " ".join(ws))


@pytest.mark.slow
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(texts=st.lists(doc_st, min_size=2, max_size=8),
       min_docs=st.integers(2, 4))
def test_line_dedup_model(spark, texts, min_docs):
    """line_dedup == the python model: a trimmed nonblank segment in
    >= min_docs distinct docs disappears from every doc, order kept."""
    from tanker_spark.operators.dedup import line_dedup

    rows = [(i, t) for i, t in enumerate(texts)]
    sep = " "
    seen = {}
    for i, t in rows:
        for seg in set(s.strip() for s in t.split(sep)):
            if seg:
                seen[seg] = seen.get(seg, 0) + 1
    dup = {s for s, c in seen.items() if c >= min_docs}
    want = {}
    for i, t in rows:
        segs = t.split(sep)
        kept = [s for s in segs if s.strip() not in dup
                or s.strip() == ""]
        want[i] = (sep.join(kept), len(segs),
                   sum(1 for s in segs if s.strip() in dup
                       and s.strip() != ""))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r.doc_id: (r.text, r.n_lines, r.n_removed)
           for r in line_dedup(df, sep=sep, min_docs=min_docs).collect()}
    assert got == want


@pytest.mark.slow
@settings(
    max_examples=5, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(texts=st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=10)
    .map(" ".join),
    min_size=2, max_size=10,
), threshold=st.sampled_from([0.3, 0.5, 0.8]))
@pytest.mark.slow
def test_ngram_jaccard_exact_model(spark, texts, threshold):
    """ngram_jaccard_exact (prefix filter + positional prune + exact
    collapse/expand) == the brute-force all-pairs python model on any
    corpus — the 100%-recall contract under composition."""
    from tanker_spark.operators import dedup

    n = 3

    def sset(t):
        toks = t.split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)}

    rows = [(i, t) for i, t in enumerate(texts)]
    want = {}
    for i, a in rows:
        for j, b in rows:
            if i >= j:
                continue
            sa, sb = sset(a), sset(b)
            jac = len(sa & sb) / len(sa | sb)
            if jac >= threshold:
                want[(i, j)] = round(jac, 6)
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.id_a, r.id_b): round(r.jaccard, 6)
           for r in dedup.ngram_jaccard_exact(
               df, n=n, threshold=threshold).collect()}
    dedup.release_caches()
    assert got == want


# -- codec junk->NULL contract fuzz (r10) -----------------------------------
#
# The vendored codecs are the one place arbitrary corpus bytes meet
# python loops inside an executor. The contract their consumers'
# junk->NULL handlers rely on: decode raises ValueError (or the honest
# NotImplementedError for unsupported-but-valid subsets) on ANYTHING
# malformed -- never struct.error / zlib.error / IndexError /
# ZeroDivisionError, never a hang, never an unbounded allocation (the
# r9 fps=0 spin and the r10 adversarial sweep both lived here).

_hdr_st = st.sampled_from([
    b"", b"MVID", b"RIFF", b"\x89PNG\r\n\x1a\n",
    b"RIFF\0\0\0\0WAVE", b"MVID\x01\x00",
])
_codec_payload_st = st.tuples(_hdr_st, st.binary(max_size=512)).map(
    lambda t: t[0] + t[1])


@settings(
    max_examples=300, deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(payload=_codec_payload_st)
def test_codec_fuzz_only_contract_errors(payload):
    from tanker_spark.operators import minipng, minivid, miniwav

    for dec in (minivid.decode_gray_video, miniwav.decode_pcm16,
                minipng.decode_gray):
        try:
            dec(payload)
        except (ValueError, NotImplementedError):
            pass
