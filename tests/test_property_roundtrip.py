"""Hypothesis port of the reference's quickcheck round-trip property
(/root/reference/tests/quickcheck.rs:249-286) plus a fuzz differential
between the vectorized parser and the oracle.

Generator character classes mirror tests/non_empty_string.rs:79-117; the
structural constraints (3164: procid only with appname, no msgid, non-empty
SD params; hostname '-' ≡ None on compare) mirror quickcheck.rs:44-104 and
243-247.  Additional carve-out documented there implicitly by improbability:
a 3164 msg must not *look like* leading structured data or a leading '-'
NILVALUE, or the grammar legitimately reassigns it — we exclude those
shapes from generation.
"""

from datetime import datetime, timezone

from hypothesis import given, settings, strategies as st

from syslog_loose_spark.config import ParseConfig
from syslog_loose_spark.oracle import (
    Message,
    parse_message,
    serialize_message,
)
from syslog_loose_spark.operators.parse import parse_lines

ASCII = [chr(c) for c in range(0x21, 0x7F)]  # printable, non-space


def _alpha(exclude: str):
    return [c for c in ASCII if c not in exclude]


def txt(exclude: str, min_size=1, max_size=15):
    return st.text(alphabet=_alpha(exclude), min_size=min_size,
                   max_size=max_size)


name_str = txt("]=-")          # SD id / param key
value_str = txt(']"\\-')       # SD param value
appname3164_str = txt("[:-")
hostname_str = txt("[:")
procname_str = txt("]:-").filter(
    lambda s: not s.lstrip("+-").isdigit() or not _fits_i32(s))
nocolon_str = txt(":-")


def _fits_i32(s):
    try:
        return -(2**31) <= int(s) <= 2**31 - 1
    except ValueError:
        return False


procid_st = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31 - 1).map(
        lambda v: ("pid", v)),
    txt("]:-").filter(lambda s: not (s.lstrip("+-").isdigit()
                                     and s.lstrip("+-") != ""
                                     and _fits_i32(s))).map(
        lambda s: ("name", s)),
)

ipv4_st = st.tuples(*[st.integers(0, 255)] * 4).map(
    lambda t: ".".join(map(str, t)))
ipv6_st = st.tuples(*[st.integers(0, 0xFFFF)] * 8).map(
    lambda t: ":".join(f"{x:x}" for x in t))
hostname_st = st.one_of(hostname_str, ipv4_st, ipv6_st, st.none())

sd_element_st = st.tuples(
    name_str,
    st.lists(st.tuples(name_str, value_str), max_size=4),
)

ts_st = st.one_of(
    st.none(),
    st.integers(min_value=-(2**31), max_value=2**31 - 1).map(
        lambda s: datetime.fromtimestamp(s, tz=timezone.utc)),
)

msg_st = st.text(
    alphabet=_alpha("") + [" "], max_size=30
).map(str.strip)


@st.composite
def message_st(draw):
    pri = draw(st.integers(0, 191))
    protocol = draw(st.sampled_from(["RFC3164", "RFC5424"]))
    sd = draw(st.lists(sd_element_st, max_size=3))
    msg = draw(msg_st)
    if protocol == "RFC3164":
        sd = [e for e in sd if e[1]]       # quickcheck.rs:54-60
        appname = draw(st.one_of(st.none(), appname3164_str))
        procid = draw(procid_st) if appname is not None else None
        if draw(st.booleans()) and procid is not None:
            procid = None
        msgid = None
        version = None
        # grammar-legitimate reassignment shapes (see module docstring)
        if msg[:1] in ("-", "["):
            msg = "x" + msg
    else:
        appname = draw(st.one_of(st.none(), nocolon_str))
        procid = draw(st.one_of(st.none(), procid_st))
        msgid = draw(st.one_of(st.none(), nocolon_str))
        version = 1
    pid, pname = (None, None)
    if procid is not None:
        pid, pname = (procid[1], None) if procid[0] == "pid" \
            else (None, procid[1])
    return Message(
        protocol=protocol, version=version,
        facility=pri >> 3, severity=pri & 7,
        timestamp=draw(ts_st), hostname=draw(hostname_st),
        appname=appname, procid_pid=pid, procid_name=pname,
        msgid=msgid, structured_data=sd, msg=msg,
    )


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _epoch_us(ts):
    if ts is None:
        return None
    td = ts - _EPOCH
    return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds


def _hostname_eq(a, b):
    # '-' ≡ None (quickcheck.rs:243-247)
    return a == b or (a == "-" and b is None) or (a is None and b == "-")


@settings(max_examples=1000, deadline=None)
@given(message_st())
def test_roundtrip_oracle(m):
    text = serialize_message(m)
    p = parse_message(text)
    assert p.protocol == m.protocol
    assert p.facility == m.facility and p.severity == m.severity
    assert p.timestamp == m.timestamp
    assert _hostname_eq(m.hostname, p.hostname)
    assert p.appname == m.appname
    assert (p.procid_pid, p.procid_name) == (m.procid_pid, m.procid_name)
    assert p.msgid == m.msgid
    assert [(i, sorted(ps)) for i, ps in p.structured_data] == \
           [(i, sorted(ps)) for i, ps in m.structured_data]
    assert p.msg == m.msg


@settings(max_examples=1000, deadline=None)
@given(message_st())
def test_roundtrip_vectorized(m):
    text = serialize_message(m)
    cols = parse_lines([text], [text], ParseConfig())
    (c_proto, c_ver, c_fac, c_sev, c_ts, c_off, c_host, c_app, c_pid,
     c_pname, c_msgid, c_sd, c_msg, c_ok) = cols
    assert c_proto[0] == m.protocol
    assert (c_fac[0], c_sev[0]) == (m.facility, m.severity)
    want_ts = _epoch_us(m.timestamp)
    assert c_ts[0] == want_ts
    assert _hostname_eq(m.hostname, c_host[0])
    assert c_app[0] == m.appname
    assert (c_pid[0], c_pname[0]) == (m.procid_pid, m.procid_name)
    assert c_msgid[0] == m.msgid
    assert [(i, sorted(ps)) for i, ps in c_sd[0]] == \
           [(i, sorted(ps)) for i, ps in m.structured_data]
    assert c_msg[0] == m.msg


def _msg_eq(om, cols, i):
    (c_proto, c_ver, c_fac, c_sev, c_ts, c_off, c_host, c_app, c_pid,
     c_pname, c_msgid, c_sd, c_msg, c_ok) = cols
    want_ts = _epoch_us(om.timestamp)
    return (c_proto[i] == om.protocol and c_ver[i] == om.version
            and c_fac[i] == om.facility and c_sev[i] == om.severity
            and c_ts[i] == want_ts and c_host[i] == om.hostname
            and c_app[i] == om.appname and c_pid[i] == om.procid_pid
            and c_pname[i] == om.procid_name and c_msgid[i] == om.msgid
            and c_sd[i] == om.structured_data and c_msg[i] == om.msg)


@settings(max_examples=2000, deadline=None)
@given(st.text(max_size=60))
def test_fuzz_differential_any_unicode(s):
    cols = parse_lines([s], [s], ParseConfig())
    assert _msg_eq(parse_message(s), cols, 0), s


# biased fuzz: syslog-ish alphabet hits grammar branches far more often.
# Includes non-ASCII decimal digits (٣١２) and NBSP: \d-vs-[0-9] and
# \s-vs-nom-space divergences must surface here, not in production.
SYSLOGISH = list('<>[]"\\=:- \tabc019.TZ+\n\u0663\u0661\uff12\u00a0\x1c')


@settings(max_examples=3000, deadline=None)
@given(st.text(alphabet=SYSLOGISH, max_size=60))
def test_fuzz_differential_syslogish(s):
    cols = parse_lines([s], [s], ParseConfig())
    assert _msg_eq(parse_message(s), cols, 0), s


@settings(max_examples=1500, deadline=None)
@given(st.text(alphabet=SYSLOGISH, max_size=60), st.integers(-14, 14))
def test_fuzz_differential_with_tz(s, tzh):
    cfg = ParseConfig(tz_offset_seconds=tzh * 3600)
    cols = parse_lines([s], [s], cfg)
    assert _msg_eq(parse_message(s, cfg), cols, 0), s


@settings(max_examples=800, deadline=None)
@given(st.text(alphabet=SYSLOGISH, max_size=60))
def test_fuzz_differential_named_tz(s):
    """DST-aware named-zone mode: engine and oracle must agree on every
    input, including 3164 timestamps that land in the America/New_York
    spring-forward gap (both must fall back)."""
    cfg = ParseConfig(tz_name="America/New_York")
    cols = parse_lines([s], [s], cfg)
    assert _msg_eq(parse_message(s, cfg), cols, 0), s


# month/day/time alphabet biased to generate parseable 3164 timestamps
# around the 2020 DST transitions (Mar 8 / Nov 1 in America/New_York)
DSTISH = list("MarNov 0123456789:<>ha")


@settings(max_examples=1200, deadline=None)
@given(st.text(alphabet=DSTISH, max_size=40))
def test_fuzz_differential_dst_edges(s):
    cfg = ParseConfig(tz_name="America/New_York")
    cols = parse_lines([s], [s], cfg)
    assert _msg_eq(parse_message(s, cfg), cols, 0), s


# alphabet biased to emit with-year timestamps near the datetime range
# boundaries (years built from 0/1/9): offset-shifted wall clocks outside
# year 1..9999 must be a parse failure on BOTH sides, never a crash
# (ADVICE r2: OverflowError in zone_offset_from_utc / astimezone paths)
BOUNDARYISH = list("JanDec 019:<>ha")


@settings(max_examples=1200, deadline=None)
@given(st.text(alphabet=BOUNDARYISH, max_size=40),
       st.sampled_from(["America/New_York", "Asia/Tokyo"]))
def test_fuzz_differential_year_boundaries_named_tz(s, tz):
    cfg = ParseConfig(tz_name=tz)
    cols = parse_lines([s], [s], cfg)
    assert _msg_eq(parse_message(s, cfg), cols, 0), s


@settings(max_examples=1200, deadline=None)
@given(st.text(alphabet=BOUNDARYISH, max_size=40),
       st.sampled_from([-14 * 3600, -5 * 3600, 9 * 3600, 14 * 3600]))
def test_fuzz_differential_year_boundaries_fixed_tz(s, off):
    cfg = ParseConfig(tz_offset_seconds=off)
    cols = parse_lines([s], [s], cfg)
    assert _msg_eq(parse_message(s, cfg), cols, 0), s
