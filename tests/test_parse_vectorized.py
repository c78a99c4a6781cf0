"""Differential tests: vectorized master-regex parser vs plain-Python oracle.

Every behavior divergence between operators/parse.py and oracle.py is a bug
in one of them; the oracle is itself pinned to the reference semantics by
tests/test_oracle_golden.py.
"""

from datetime import datetime, timezone

import pytest

from syslog_loose_spark.config import ParseConfig
from syslog_loose_spark.oracle import parse_message
from syslog_loose_spark.operators.parse import parse_lines
from syslog_loose_spark.sources.corpus import GOLDEN_CORPUS

# strings engineered at the grammar's committed-choice edges
ADVERSARIAL = [
    "",
    " ",
    "-",
    ":",
    "<>",
    "<34>",
    "<34> ",
    "<256>Oct 11 22:14:15 host app: message",       # u8 PRI overflow
    "<192>1 - h a - - - x",                          # facility 24 -> null
    "<34>99999999999 - h a - - - x",                 # u32 version overflow
    "<34>1 -x h a - - - x",                          # '-' ts committed, fails
    "<34>1 - h: a - - - x",                          # host trailing colon
    "<34>1 - : a - - - x",                           # bare-colon host
    "<34>1 - h a - - : x",                           # bare-colon msgid
    "<34>1 - h a - - x",                             # missing SD -> fail
    "<34>1 - h a - - -x",                            # SD '-' eats one char
    "<34>1 - h a - - - -x",                          # SD then msg '-x'
    "<34>1 2003-10-11T22:14:15.003Z",                # ts at EOS, no space
    "<34>1 - h a 99999999999999999999 - - x",        # pid i32 overflow->name
    "<34>1 - h a +42 - - x",                         # signed pid
    "<34>1 - h a - msgid: - x",                      # trailing colon msgid
    "<34>1 - h a - - [a][b] x",                      # two empty SD elems
    "<34>1 - h a - - [a] [b] x",                     # space stops many1
    "<34>1 - h a - - [a]junk x",                     # junk after SD
    "<34>1 - h a - - [bad unclosed x",               # unterminated elem
    '<34>1 - h a - - [id k="v"unclosed x',
    '<34>1 - h a - - [id aa bb="x"] m',              # key containing space
    '<34>1 - h a - - [id ="x"] m',                   # empty key
    '<34>1 - h a - - [id= k="v"] m',                 # '=' in id position
    '<34>1 - h a - - [idkey="v"] m',                 # no space after id
    '<34>1 - h a - - [id k= "v"] m',                 # space after '='
    '<34>1 - h a - - [id k ="v"] m',                 # space before '=' (key!)
    '<34>1 - h a - - [id k=""] m',                   # empty value
    '<34>1 - h a - - [id k=""x"] m',
    '<34>1 - h a - - [id k="a\\"] m',                # escaped quote at end
    '<34>1 - h a - - [id k="\\"] m',                 # only an escape pair
    '<34>1 - h a - - [id k="v1" k="v2"] m',          # duplicate keys kept
    "<34>Oct 11 22:14:15 : a message",
    "<34>OCT 11 22:14:15 : a message",
    "<34>oct 11 22:14:15 : a message",
    "<34>Xxx 11 22:14:15 : a message",               # bad month -> fallback
    "<34>Oct 11 22:14:15: a message",                # trailing ':' on ts
    "<34>Oct 11 22:14:15:a message",
    "<34>Oct  11  22:14:15 host app: m",             # multi-space in ts
    "<34>Oct 11 2008 22:14:15 host app: m",
    "<34>Oct 99 22:14:15 host app: m",               # invalid day
    "<34>Feb 29 14:07:19 host app: m",               # leap-dependent
    "<34>Dec 28 16:49:07 - app[1]: m",               # '-' hostname field
    "<34>Dec 28 16:49:07 myhost -: m",               # '-' tag field
    "<34>Dec 28 16:49:07 myhost - : m",
    "<34>Dec 28 16:49:07 app[notanumber]: m",        # procid name
    "<34>Dec 28 16:49:07 app[123x]: m",
    "<34>Dec 28 16:49:07 [1]: m",                    # empty appname systag
    "<34>Dec 28 16:49:07 app[]: m",                  # empty pid -> not systag
    "<34>Dec 28 16:49:07 host:rest",                 # colon mid-host
    "<34>Dec 28 16:49:07 host: rest",
    "<34>Dec 28 16:49:07 host:: rest",
    "<34>Dec 28 16:49:07 ::1 app: m",                # ipv6 host
    "<34>Dec 28 16:49:07 host  two spaces",
    "<34>Dec 28 16:49:07 host\ttab",
    "<34>- host app: m",                             # '-' 3164 timestamp
    "<34>-x host app: m",
    "<34>2020-10-11T22:14:15.00Z mymachine app[323]: a message",
    "<34>2020-10-11t22:14:15z m app: x",             # lowercase t/z + space
    "<34>2020-13-11T22:14:15Z m app: x",             # invalid month 3339
    "<34>2020-10-11T22:14:15+24:00 m app: x",        # offset out of range
    "<34>2020-10-11T22:14:15.999999999+00:00 m app: x",  # nanos truncated
    "<34>Dec 28 16:49:07 host - - -: m",
    "<13>Feb 13 20:07:26 74794bfb6795 root[8539]:syslog message",
    "<4>Jan 26 05:59:54 ubnt kernel: [WAN_LOCAL-default-D]IN=eth0 OUT=",
    "<34>Oct 11 22:14:15 host app: [id k=\"v\"] tail",   # valid 3164 SD
    "<34>Oct 11 22:14:15 host app: [id] tail",           # empty elem in msg
    "<34>Oct 11 22:14:15 host app: - leading dash msg",  # SD '-' eats dash
    "<34>Oct 11 22:14:15 host app: -leading dash msg",
    "no pri Dec 28 16:49:07 host app: m",
    "Dec 28 16:49:07 host app: m",
    "1 - h a - - - just fields",
    "2 - h a - - - version two",
    "<165>1 2003-10-11T22:14:15.003Z m e - ID47 "
    '[id aa="hullo \\"there\\"" bb="let\'s \\\\\\\\do this\\\\\\\\" '
    'cc="hello [bye\\]" dd="hello\\nbye" ee="not \\esc\\aped"] qwerty',
    " <34>1 - h a - - - nbsp lead",              # NBSP is whitespace
    "<34>1 - h x a - - - nbsp in host",
    "<34>1 - ü ä - - - unicode fields",
    "<34>Oct 11 22:14:15 host app: msg with \n newline inside",
    "<34>1 - h a - - - msg with \n newline",
    # unicode edges: multibyte chars in the month take(3) position,
    # NBSP separators (whitespace in both engines), zero-width joiners
    "<34>Ωct 11 22:14:15 host app: m",
    "<34>ÖCT 11 22:14:15 host app: m",
    "<34>デec 28 16:49:07 h a: m",
    "<34>Deç 28 16:49:07 h a: m",
    "<34>Dec\u00a028 16:49:07 h a: m",
    "<34>Dec 28 16:49:07 hôst äpp: ünï müß",
    "<34>Oct 11 22:14:15\u2028ls: m",
    "<34>Oct 11 22:14:15 a\u200bb: m",
    "\u00a0<34>1 - h a - - - lead nbsp",
    '<34>1 - h a - - [id ké="vé"] m',
    # non-ASCII decimal digits: Python's \d would accept these, nom's
    # digit1 (ASCII) does not — all must be fallback rows in both engines
    "<٣>Oct 11 22:14:15 host app[1]: msg",      # Arabic-Indic PRI
    "<34>Oct ١١ 22:14:15 host app: msg",   # unicode day
    "<34>Oct 11 2٢:14:15 host app: m",          # unicode hour digit
    "<3٤>Oct 11 22:14:15 host app: m",          # mixed-digit PRI
    "<34>١ - h a - - - unicode version",        # unicode 5424 version
    "<34>1 ٢003-10-11T22:14:15.003Z h a - - - x",  # unicode 3339 year
    "<34>Oct 11 2008 16:49:07 host app: m٠",    # unicode in msg is fine
    # '-' + trailing-colon split-back: literal '-' hostname, not NILVALUE
    "<34>Oct 11 22:14:15 -: a message",
    "<34>Oct 11 22:14:15 - : a message",
    "<34>Oct 11 22:14:15 -:x m",
    "<34>Oct 11 22:14:15 -:",
    "<34>Oct 11 22:14:15 - -: m",
    # leap second folds to next-minute start on BOTH sides (chrono parity)
    "<34>1 2003-10-11T22:14:60Z h a - - - leap",
    "<34>1 2003-10-11T22:14:60.25+05:30 h a - - - leap frac offset",
    "<34>1 9999-12-31T23:59:60Z h a - - - leap past datetime.max",
    "<34>2016-12-31T23:59:60.5Z host app: leap in 3164 envelope",
    "<34>1 1969-12-31T23:59:59.5Z h a - - - pre-epoch",
    # C0 separators \x1c-\x1f: Python isspace()/\s say whitespace, Rust
    # char::is_whitespace (Unicode White_Space) says NOT — they are token
    # content, and the whole-input trim must not eat them
    "<34>1 - h\x1cx a - - - fs in host",
    "<34>1 - h a\x1d b - - - fs in app",
    "\x1c<34>1 - h a - - - leading fs untrimmed",
    "<34>1 - h a - - - trailing fs\x1f",
    "<34>Oct 11 22:14:15 host\x1cname app: m",
    "<34>Oct 11 22:14:15 h app\x1e[1]: m",
    '<34>1 - h a - - [id\x1cx k="v"] m',
    "<34>Oct 11 22:14:15 h a:\x1cmsg body",
    "\u2028<34>1 - h a - - - ls IS whitespace, trimmed",
    "<34>Oct 11 22:14:15 -\x1c: fs after dash",
    # escaped NEWLINE inside an SD value (nom escaped(..., anychar)
    # accepts any char incl. \n) — regression: sub-scanners missing re.S
    # silently degraded the element to junk
    '<34>1 - h a - - [id k="a\\\nb"] m',
    '<34>1 - h a - - [id k="a\\\nb" c="d"] m',
    '<34>Oct 11 22:14:15 h a: [id k="x\\\ny"] t',
    '<34>1 - h a - - [id\nx k="v"] m',
    # checked digit conversion: CPython's int() raises past 4,300 digits,
    # Rust's checked from_str never crashes and accepts any number of
    # leading zeros ('<000...034>' IS PRI 34). Must parse or fall back,
    # never raise.
    "<" + "9" * 5000 + ">Oct 11 22:14:15 h a: m",
    "<34>" + "1" * 5000 + " - h a - - - x",
    "<34>Oct 11 " + "2" * 5000 + ":14:15 h a: m",
    "<34>1 - h a " + "4" * 5000 + " - - x",
    "<" + "0" * 5000 + "34>Oct 11 22:14:15 h a: m",   # PRI 34
    "<34>" + "0" * 4400 + "1 - h a - - - v1",          # version 1
    "<34>1 - h a +" + "0" * 4400 + "42 - - x",         # PID 42
    "<34>1 - h a -" + "0" * 4400 + "7 - - x",          # PID -7
    "<34>Oct 0000000011 22:14:15 h a: m",              # 10-digit 0-pad day
    "<34>Oct " + "0" * 4400 + "11 22:14:15 h a: m",
    "<34>Dec 28 0000002008 16:49:07 h a: m",           # 0-padded year
    "<34>Dec 28 16:49:07 app[" + "0" * 4400 + "9]: m",
    "<034>Oct 11 22:14:15 h a: m",
    # datetime-range boundaries: with-year timestamps whose offset-shifted
    # wall clock leaves Python's year 1..9999 range (e.g. year 1 in a
    # west-of-UTC zone, year 9999 in an east-of-UTC zone) must be a parse
    # FAILURE on both engine and oracle, never an OverflowError crash.
    # chrono (range ±262143) parses these — documented deviation.
    "<34>Jan 1 0001 00:00:00 h a: m",
    "<34>Jan  1 0001 00:00:00 host app[1]: m",
    "<34>Dec 31 9999 23:59:59 h a: m",
    "<34>Dec 31 9999 23:59:59 host app: m",
    "<34>Jan 2 0001 00:00:00 h a: m",       # one day in: parses at -5h
    "<34>Dec 30 9999 23:59:59 h a: m",      # one day back: parses at +9h
    "<34>1 0001-01-01T00:00:00Z h a - - - min 3339",
    "<34>1 9999-12-31T23:59:59.999999Z h a - - - max 3339",
    "<34>1 0001-01-01T00:00:00+09:00 h a - - - min 3339 east",
    "<34>1 9999-12-31T23:59:59-05:00 h a - - - max 3339 west",
]


EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _norm_ts(ts):
    """aware datetime -> epoch microseconds (parse_lines representation)."""
    if ts is None:
        return None
    td = ts - EPOCH
    return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds


def check_rows(rows, cfg=ParseConfig()):
    cols = parse_lines(rows, rows, cfg)
    (c_proto, c_ver, c_fac, c_sev, c_ts, c_off, c_host, c_app, c_pid,
     c_pname, c_msgid, c_sd, c_msg, c_ok) = cols
    for i, raw in enumerate(rows):
        om = parse_message(raw, cfg)
        ctx = f"row {i!r}: {raw!r}"
        assert c_proto[i] == om.protocol, ctx
        assert c_ver[i] == om.version, ctx
        assert c_fac[i] == om.facility, ctx
        assert c_sev[i] == om.severity, ctx
        assert c_ts[i] == _norm_ts(om.timestamp), ctx
        if om.timestamp is not None:
            assert c_off[i] == int(om.timestamp.utcoffset().total_seconds()), ctx
        assert c_host[i] == om.hostname, ctx
        assert c_app[i] == om.appname, ctx
        assert c_pid[i] == om.procid_pid, ctx
        assert c_pname[i] == om.procid_name, ctx
        assert c_msgid[i] == om.msgid, ctx
        assert c_sd[i] == om.structured_data, ctx
        assert c_msg[i] == om.msg, ctx


def test_golden_corpus_matches_oracle():
    check_rows([line for _, line in GOLDEN_CORPUS])


def test_adversarial_matches_oracle():
    check_rows(ADVERSARIAL)


def test_adversarial_with_tz_offset():
    check_rows(ADVERSARIAL, ParseConfig(tz_offset_seconds=5 * 3600))
    check_rows(ADVERSARIAL, ParseConfig(tz_offset_seconds=-3 * 3600))


def test_variants():
    rows = [line for _, line in GOLDEN_CORPUS]
    check_rows(rows, ParseConfig(variant="rfc3164"))
    check_rows(rows, ParseConfig(variant="rfc5424"))


def test_year_policy_threading():
    check_rows(["<34>Feb 29 14:07:19 h a: m"],
               ParseConfig(year_policy=lambda m: 2019))
    check_rows(["<34>Feb 29 14:07:19 h a: m"],
               ParseConfig(year_policy=lambda m: 2020))


# ---------------------------------------------------------------------------
# named IANA timezone (DST-aware) mode — reference Option<Tz> path
# (timestamp.rs:95-118): earliest-on-ambiguity, fail-on-gap
# ---------------------------------------------------------------------------

NY = "America/New_York"


def test_named_tz_differential():
    check_rows(ADVERSARIAL, ParseConfig(tz_name=NY))
    check_rows([line for _, line in GOLDEN_CORPUS], ParseConfig(tz_name=NY))


def test_named_tz_differential_east():
    """East-of-UTC named zone: year-9999 with-year rows overflow the other
    edge of the datetime range (ADVICE r2 high finding)."""
    check_rows(ADVERSARIAL, ParseConfig(tz_name="Asia/Tokyo"))


def test_year_boundary_fallback_never_crashes():
    """The four ADVICE r2 reproducers: engine == oracle == fallback row."""
    rows = ["<34>Jan 1 0001 00:00:00 h a: m",
            "<34>Dec 31 9999 23:59:59 h a: m"]
    for cfg in (ParseConfig(tz_name=NY), ParseConfig(tz_name="Asia/Tokyo"),
                ParseConfig(tz_offset_seconds=9 * 3600),
                ParseConfig(tz_offset_seconds=-5 * 3600),
                ParseConfig(tz_offset_seconds=14 * 3600),
                ParseConfig(tz_offset_seconds=-14 * 3600),
                ParseConfig()):
        check_rows(rows, cfg)
    # the overflow direction matters: each boundary row still PARSES when
    # the offset shifts the wall clock INTO range
    cols = parse_lines(rows, rows, ParseConfig(tz_offset_seconds=9 * 3600))
    assert cols[13][0] is True and cols[13][1] is False
    cols = parse_lines(rows, rows, ParseConfig(tz_offset_seconds=-5 * 3600))
    assert cols[13][0] is False and cols[13][1] is True


def test_named_tz_semantics():
    cfg = ParseConfig(tz_name=NY)
    # plain winter time: EST (-5) -> 20:33:03Z
    cols = parse_lines(["<46>Jan  5 15:33:03 h rsyslogd: x"], ["x"], cfg)
    assert cols[4][0] == int(datetime(2020, 1, 5, 20, 33, 3,
                                      tzinfo=timezone.utc).timestamp() * 1e6)
    assert cols[5][0] == -5 * 3600
    # DST gap (2020-03-08 02:30 does not exist in NY): timestamp parse
    # fails -> whole 3164 fails -> fallback row (chrono earliest() == None)
    raw = "<34>Mar  8 02:30:00 host app: m"
    cols = parse_lines([raw], [raw], cfg)
    assert cols[13][0] is False and cols[12][0] == raw
    # ambiguous (2020-11-01 01:30 occurs twice): earliest == EDT (-4)
    cols = parse_lines(["<34>Nov  1 01:30:00 host app: m"], ["x"], cfg)
    assert cols[4][0] == int(datetime(2020, 11, 1, 5, 30,
                                      tzinfo=timezone.utc).timestamp() * 1e6)
    assert cols[5][0] == -4 * 3600
    # with-year + named zone: naive attached as UTC, zone offset at that
    # instant merely displayed (from_naive_utc_and_offset)
    cols = parse_lines(["<34>Oct 11 2008 22:14:15 h app: m"], ["x"], cfg)
    assert cols[4][0] == int(datetime(2008, 10, 11, 22, 14, 15,
                                      tzinfo=timezone.utc).timestamp() * 1e6)
    assert cols[5][0] == -4 * 3600  # EDT at that UTC instant


def test_named_tz_gap_matches_oracle():
    for raw in ("<34>Mar  8 02:30:00 host app: m",
                "<34>Mar  8 02:00:00 host app: m",
                "<34>Mar  8 03:00:00 host app: m",
                "<34>Nov  1 01:00:00 host app: m",
                "<34>Nov  1 02:00:00 host app: m"):
        check_rows([raw], ParseConfig(tz_name=NY))


def test_year_policy_full_incomplete_date():
    """The reference resolver receives (month, day, hour, minute, second)
    (lib.rs:105-110) — a day-granular policy must be expressible."""
    pol = lambda mon, d, h, mi, s: 2019 if (mon, d) >= (6, 15) else 2020
    cfg = ParseConfig(year_policy=pol)
    cols = parse_lines(["<34>Jun 14 10:00:00 h a: m",
                        "<34>Jun 15 10:00:00 h a: m"], ["x", "y"], cfg)
    y = [datetime.fromtimestamp(t / 1e6, tz=timezone.utc).year
         for t in cols[4]]
    assert y == [2020, 2019]
    check_rows(["<34>Jun 14 10:00:00 h a: m",
                "<34>Jun 15 10:00:00 h a: m",
                "<34>Feb 29 14:07:19 h a: m"], cfg)
