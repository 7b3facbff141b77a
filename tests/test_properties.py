"""Property-based tests (hypothesis) for the pure-Python semantics kernel.

The reference pins these behaviors with example-based goldens only (SURVEY
§5); properties cover the space between the examples:

1. two-phase glob contract: the pushdown predicates (what the catalog scan
   filters on) must NEVER exclude a name the authoritative regex accepts —
   soundness of the prefilter (glob_utils.py:367-370 split);
2. Stage/Retention string codecs round-trip;
3. align_time_window returns stage-aligned bounds for a stage of the
   retention, never widening past the raw horizon;
4. aggregator merge/aggregate identity: folding partials then finalizing
   equals finalizing the concatenation (the CASSANDRA_DESIGN.md:43
   sum/count-carrying contract);
5. the stage0 ring buffer keeps at most ``capacity`` live slots, all within
   the window ending at the newest step.
"""

import math

from hypothesis import given, settings, strategies as st

from biggraphite_spark.globs import GlobError, compile_glob
from biggraphite_spark.model import Aggregator, Retention, Stage
from biggraphite_spark.streaming.stateful import feed_slots

# --------------------------------------------------------------------------
# 1. glob pushdown soundness
# --------------------------------------------------------------------------

_ATOM = st.sampled_from(
    ["a", "b", "c", "ab", "*", "?", "[ab]", "[!a]", "{a,b}", "{a,bc}", "a*", "*b"]
)
_COMPONENT = st.lists(_ATOM, min_size=1, max_size=3).map("".join)
_GLOB = st.builds(
    lambda comps, star_at: ".".join(
        comps[:star_at] + ["**"] + comps[star_at:] if star_at is not None else comps
    ),
    st.lists(_COMPONENT, min_size=1, max_size=4),
    st.one_of(st.none(), st.integers(0, 4)),
)
_NAME = st.lists(
    st.sampled_from(["a", "b", "c", "ab", "bc", "abc", "ba"]), min_size=1, max_size=5
).map(".".join)


def _pushdown_accepts(plan, name: str) -> bool:
    """Python mirror of operators/find.glob_predicate over p0..pN/depth."""
    comps = [c for c in name.split(".") if c != ""]
    depth = len(comps) - 1
    if plan.fully_literal is not None and name != plan.fully_literal:
        return False
    if plan.depth_exact is not None and depth != plan.depth_exact:
        return False
    if plan.depth_min is not None and depth < plan.depth_min:
        return False
    for cp in plan.components:
        if cp.index >= len(comps):
            return False
        c = comps[cp.index]
        if cp.kind == "literal" and c != cp.values[0]:
            return False
        if cp.kind == "enum" and c not in cp.values:
            return False
        if cp.kind == "prefix" and not c.startswith(cp.values[0]):
            return False
    return True


@settings(max_examples=400)
@given(pattern=_GLOB, name=_NAME)
def test_pushdown_never_excludes_a_regex_match(pattern, name):
    try:
        plan = compile_glob(pattern)
    except GlobError:
        return  # invalid pattern: nothing to check
    if plan.compiled().match(name):
        assert _pushdown_accepts(plan, name), (
            f"pushdown for {pattern!r} excluded regex match {name!r}: {plan}"
        )


@settings(max_examples=200)
@given(pattern=_GLOB, name=_NAME)
def test_fully_literal_is_exact(pattern, name):
    try:
        plan = compile_glob(pattern)
    except GlobError:
        return
    if plan.fully_literal is not None:
        # the point-lookup fast path must agree exactly with the regex
        assert bool(plan.compiled().match(name)) == (name == plan.fully_literal)


# --------------------------------------------------------------------------
# 2./3. stage & retention
# --------------------------------------------------------------------------

@st.composite
def retentions(draw):
    n = draw(st.integers(1, 4))
    precision = draw(st.integers(1, 10))
    duration = 0
    stages = []
    for _ in range(n):
        points = draw(st.integers(duration // precision + 1, duration // precision + 500))
        stages.append(Stage(points=points, precision=precision, stage0=not stages))
        duration = points * precision
        precision *= draw(st.sampled_from([2, 3, 4, 10]))
    return Retention(stages)


@settings(max_examples=200)
@given(retentions())
def test_retention_codec_roundtrip(ret):
    assert Retention.from_string(ret.as_string()).as_string() == ret.as_string()
    for stage in ret.stages:
        back = Stage.from_string(stage.as_string())
        assert (back.points, back.precision) == (stage.points, stage.precision)


@settings(max_examples=300)
@given(
    ret=retentions(),
    now=st.integers(10**6, 2 * 10**9),
    span=st.integers(1, 10**8),
    lag=st.integers(0, 10**8),
)
def test_align_time_window_invariants(ret, now, span, lag):
    end = now - lag
    start = end - span
    a_start, a_end, stage = ret.align_time_window(start, end, now)
    assert stage in ret.stages
    assert a_start % stage.precision == 0
    assert a_end % stage.precision == 0
    assert a_start <= a_end
    # never reach before the stage horizon or after now (rounded up)
    assert a_start >= stage.round_down(now - stage.duration)
    assert a_end <= stage.round_up(now)


# --------------------------------------------------------------------------
# 4. aggregator identities
# --------------------------------------------------------------------------

_VALUES = st.lists(
    st.one_of(st.integers(-100, 100).map(float), st.just(float("nan"))),
    min_size=0,
    max_size=12,
)


@settings(max_examples=300)
@given(values=_VALUES, split=st.integers(0, 12),
       agg=st.sampled_from(["average", "total", "minimum", "maximum"]))
def test_merge_then_aggregate_equals_direct(values, split, agg):
    """Partial-state fold: aggregate(merge(left), merge(right)) ==
    aggregate(all) — integer-valued floats so FP association is exact."""
    a = Aggregator(agg)
    split = min(split, len(values))
    left, right = values[:split], values[split:]
    parts, counts = [], []
    for chunk in (left, right):
        if chunk:
            v, c = a.merge(chunk)
            parts.append(v)
            counts.append(c)
    via_partials = a.aggregate(parts, counts)
    direct = a.aggregate(values)
    if math.isnan(direct):
        assert math.isnan(via_partials)
    else:
        assert via_partials == direct


# --------------------------------------------------------------------------
# 5. ring buffer invariants
# --------------------------------------------------------------------------

@settings(max_examples=300)
@given(
    points=st.lists(
        st.tuples(st.integers(0, 500), st.integers(-5, 5).map(float)),
        min_size=0,
        max_size=40,
    ),
    capacity=st.integers(1, 8),
)
def test_ring_buffer_window_invariant(points, capacity):
    slots: dict[int, float] = {}
    epoch, out = feed_slots(None, slots, points, precision=10, capacity=capacity)
    assert len(slots) <= capacity
    if epoch is not None:
        assert all(epoch - capacity < s <= epoch for s in slots)
    # emissions: finals first, then live updates sorted by ts
    finals = [e for e in out if e[2]]
    lives = [e for e in out if not e[2]]
    assert out == finals + lives
    assert lives == sorted(lives, key=lambda e: e[0])
    # every live-emitted slot is still in the buffer with that value
    for ts, v, _ in lives:
        assert slots[ts // 10] == v


@given(
    samples=st.lists(st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200),
    rate=st.sampled_from([4000, 8000, 16000, 44100]),
    channels=st.integers(min_value=1, max_value=2),
)
@settings(max_examples=200, deadline=None)
def test_wav_codec_roundtrip(samples, rate, channels):
    """encode_wav -> _decode_wav is the identity on any PCM16 payload whose
    sample count is a whole number of frames."""
    import struct as _struct

    from biggraphite_spark.operators.multimodal import _decode_wav, encode_wav

    if len(samples) % channels:
        samples = samples[: len(samples) - (len(samples) % channels)] or [0] * channels
    pcm = _struct.pack(f"<{len(samples)}h", *samples)
    rate2, ch2, out = _decode_wav(encode_wav(rate, channels, pcm))
    assert (rate2, ch2, out) == (rate, channels, list(samples))


@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=200, deadline=None)
def test_bmp_codec_roundtrip_any_geometry(w, h, seed):
    """encode_bmp -> _decode_bmp is the identity for every geometry,
    including widths whose rows need padding (w*3 % 4 != 0)."""
    from biggraphite_spark.operators.multimodal import _decode_bmp, encode_bmp

    rgb = bytes((seed + i * 97) % 256 for i in range(w * h * 3))
    w2, h2, out = _decode_bmp(encode_bmp(w, h, rgb))
    assert (w2, h2, out) == (w, h, rgb)
