"""Property-based ingest contract (hypothesis): the reference has no
property tests (SURVEY.md §5) — this is our addition.  Core
invariant: a value always COERCES cleanly into the type INFERRED
from it (inference and coercion can never disagree), and inference
is total and deterministic over arbitrary JSON scalars."""

import json
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from rakam_api_spark.ingest.infer import infer_field_type
from rakam_api_spark.types import FieldType

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**53), max_value=2**53),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=60),
)


@given(json_scalars)
@settings(max_examples=300, deadline=None)
def test_inference_total_and_deterministic(v):
    t1 = infer_field_type(v)
    t2 = infer_field_type(v)
    assert t1 == t2
    if v is None:
        assert t1 is None  # type deferred, like the reference
    else:
        assert isinstance(t1, FieldType)


@given(st.one_of(st.booleans(), st.integers(min_value=-(2**31), max_value=2**31), st.text(max_size=40)))
@settings(max_examples=300, deadline=None)
def test_inference_precedence(v):
    """Numbers → DOUBLE, bools → BOOLEAN, strings → DATE/TIMESTAMP
    only when parseable, else STRING (JsonEventDeserializer
    getTypeForUnknown precedence)."""
    t = infer_field_type(v)
    if isinstance(v, bool):
        assert t == FieldType.BOOLEAN
    elif isinstance(v, int):
        assert t == FieldType.DOUBLE
    elif t == FieldType.DATE:
        assert len(v) >= 8  # no short-string date traps
    elif t == FieldType.TIMESTAMP:
        assert len(v) > 12  # reference rejects ≤12-char timestamps


@given(
    st.lists(
        st.one_of(
            st.booleans(),
            st.integers(min_value=-(2**40), max_value=2**40),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
            st.text(
                alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7E),
                min_size=1,
                max_size=30,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=12, deadline=None)
def test_inferred_type_always_coerces(spark_session_holder, values):
    """Batch property: every value coerces into its own inferred type
    with zero dead letters (self-consistency of F1 + F2)."""
    spark = spark_session_holder
    from pyspark.sql import types as T

    from rakam_api_spark.ingest.coerce import coerce_to_schema
    from rakam_api_spark.types import to_struct_field

    fields = {}
    row = {}
    for i, v in enumerate(values):
        ft = infer_field_type(v)
        assert ft is not None
        name = f"c{i}"
        fields[name] = ft
        # transport as JSON-ish string, like the wire format
        row[name] = v if not isinstance(v, float) else float(f"{v!r}")
    df = spark.createDataFrame(
        [tuple(json.dumps(row[f]) if not isinstance(row[f], str) else row[f] for f in fields)],
        ", ".join(f"{n} string" for n in fields),
    )
    schema = T.StructType([to_struct_field(n, ft) for n, ft in fields.items()])
    res = coerce_to_schema(df, schema, "prop_test")
    assert res.dead_letter.count() == 0
    out = res.valid.collect()[0]
    for i, v in enumerate(values):
        got = out[f"c{i}"]
        if isinstance(v, bool):
            assert got == v
        elif isinstance(v, (int, float)):
            assert got is not None and math.isclose(got, float(v), rel_tol=1e-6, abs_tol=1e-6)


# hypothesis can't take pytest fixtures directly as strategy input;
# expose the session through a module-level holder fixture
import pytest  # noqa: E402


@pytest.fixture(scope="module")
def spark_session_holder(spark):
    return spark
