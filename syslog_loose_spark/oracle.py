"""Plain-Python reference implementation of the tolerant syslog grammar.

This is the *test oracle* for the vectorized Spark engine: a fresh,
row-at-a-time re-implementation of the semantics of
StephenWakely/syslog-loose (studied at /root/reference — cited per function
as file:line), used to verify the vectorized pandas implementation and to
generate DuckDB-checkable expected outputs.  It is intentionally NOT used on
the Spark hot path.

Semantic contract highlights (see SURVEY.md §2.3):
  * unparseable input  -> all-null fields, msg == raw input verbatim
    (lib.rs:77-92)
  * whole input trimmed before parsing (lib.rs:47)
  * Either variant tries RFC5424 then RFC3164 (lib.rs:45-48)
  * '-' is the NILVALUE for every optional field (parsers.rs:37)
  * year/timezone resolution is pinned & deterministic (config.py)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timedelta, timezone
from typing import List, Optional, Tuple

from .config import (
    ParseConfig,
    VARIANT_EITHER,
    VARIANT_RFC3164,
    VARIANT_RFC5424,
)

U8_MAX = 255
U32_MAX = 4294967295
I32_MIN, I32_MAX = -(2**31), 2**31 - 1

# Facility / severity name tables (pri.rs:77-104, pri.rs:145-156).
FACILITY_NAMES = (
    "kern user mail daemon auth syslog lpr news uucp cron authpriv ftp "
    "ntp audit alert clockd local0 local1 local2 local3 local4 local5 "
    "local6 local7"
).split()
SEVERITY_NAMES = "emerg alert crit err warning notice info debug".split()

MONTHS = {
    "jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
    "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12,
}

#: Rust char::is_whitespace == the Unicode White_Space property.  Python's
#: str.isspace()/regex \s additionally treat the C0 separators
#: \x1c-\x1f as whitespace; the reference does NOT, so whitespace checks
#: and the whole-input trim (lib.rs:47) use this exact set.
REF_WS = ("\t\n\x0b\x0c\r \x85\xa0\u1680"
          "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
          "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000")
_WS_SET = frozenset(REF_WS)


class ParseFail(Exception):
    """Internal backtracking signal (the nom Err::Error analogue)."""


@dataclass
class Message:
    """The parsed record (message.rs:14-26), flat Python form."""

    protocol: str = "RFC3164"          # "RFC3164" | "RFC5424"
    version: Optional[int] = None      # 5424 version integer
    facility: Optional[int] = None     # 0..23
    severity: Optional[int] = None     # 0..7
    timestamp: Optional[datetime] = None   # tz-aware (fixed offset)
    hostname: Optional[str] = None
    appname: Optional[str] = None
    procid_pid: Optional[int] = None   # ProcId::PID (procid.rs:5-8)
    procid_name: Optional[str] = None  # ProcId::Name
    msgid: Optional[str] = None
    structured_data: List[Tuple[str, List[Tuple[str, str]]]] = dc_field(
        default_factory=list
    )
    msg: str = ""

    def eq_reference(self, other: "Message") -> bool:
        """Message equality per message.rs:90-102: every field except
        protocol; timestamps compare by instant; SD params as sorted
        multisets (structured_data.rs:50-69)."""
        if (self.facility, self.severity, self.hostname, self.appname,
                self.procid_pid, self.procid_name, self.msgid, self.msg) != (
                other.facility, other.severity, other.hostname, other.appname,
                other.procid_pid, other.procid_name, other.msgid, other.msg):
            return False
        if (self.timestamp is None) != (other.timestamp is None):
            return False
        if self.timestamp is not None and self.timestamp != other.timestamp:
            return False
        if len(self.structured_data) != len(other.structured_data):
            return False
        for (id1, p1), (id2, p2) in zip(self.structured_data,
                                        other.structured_data):
            if id1 != id2 or sorted(p1) != sorted(p2):
                return False
        return True


# ---------------------------------------------------------------------------
# low-level scanners
# ---------------------------------------------------------------------------

def _space1(s: str) -> str:
    """nom space1: one or more of ' ' / '\\t'."""
    i = 0
    while i < len(s) and s[i] in " \t":
        i += 1
    if i == 0:
        raise ParseFail("space1")
    return s[i:]


def _space0(s: str) -> str:
    i = 0
    while i < len(s) and s[i] in " \t":
        i += 1
    return s[i:]


_DIGITS_RE = re.compile(r"[0-9]+")


def u_digits(ds: str, max_value: int) -> Optional[int]:
    """Rust unsigned from_str on an all-[0-9] run: checked arithmetic
    accepts ANY number of leading zeros ('<000...034>' is PRI 34) and
    overflow is a parse failure — never a crash.  Python's bare int()
    would raise ValueError past 4,300 digits (CPython's conversion
    limit), killing the task on one adversarial line."""
    if ds and len(ds) <= 9:
        # fast path (r8): any 9-digit run is < 10^9, far below Python's
        # conversion limit, so the checked compare alone suffices —
        # skips the per-call lstrip + str(max_value) construction on
        # the hot parse path.  Identical result by construction.
        v = int(ds)
        return v if v <= max_value else None
    ds = ds.lstrip("0")
    if len(ds) > len(str(max_value)):
        return None
    v = int(ds or "0")
    return v if v <= max_value else None


def _digits(s: str, max_value: int) -> Tuple[str, int]:
    """nom digit1 + FromStr with an unsigned range check (parsers.rs:11-16)."""
    m = _DIGITS_RE.match(s)
    if not m:
        raise ParseFail("digits")
    v = u_digits(m.group(0), max_value)
    if v is None:
        raise ParseFail("overflow")
    return s[m.end():], v


# ---------------------------------------------------------------------------
# PRI (pri.rs:161-184)
# ---------------------------------------------------------------------------

def decompose_pri(pri: int) -> Tuple[Optional[int], Optional[int]]:
    fac = pri >> 3
    sev = pri & 0x7
    return (fac if 0 <= fac <= 23 else None, sev if 0 <= sev <= 7 else None)


def compose_pri(facility: int, severity: int) -> int:
    return (facility << 3) + severity


def _pri(s: str) -> Tuple[str, Tuple[Optional[int], Optional[int]]]:
    """opt(delimited('<', digits::<u8>, '>')) — pri.rs:178-184.  A PRI that
    fails (no digits / >255 / unterminated) consumes nothing."""
    if s.startswith("<"):
        try:
            rest, v = _digits(s[1:], U8_MAX)
        except ParseFail:
            return s, (None, None)
        if rest.startswith(">"):
            return rest[1:], decompose_pri(v)
    return s, (None, None)


# ---------------------------------------------------------------------------
# header fields (parsers.rs:25-98)
# ---------------------------------------------------------------------------

def _optional(s: str, has_colons: bool, has_trailing_colon: bool
              ) -> Tuple[str, Optional[str]]:
    """The shared field scanner (parsers.rs:25-43): token up to whitespace
    (and ':' unless allowed); '-' -> None; a lone ':' fails; a trailing ':'
    is split back off unless the field permits it."""
    i = 0
    while i < len(s):
        c = s[i]
        if c in _WS_SET or (not has_colons and c == ":"):
            break
        i += 1
    if i == 0:
        raise ParseFail("take_while1")
    value = s[:i]
    if value == ":":
        raise ParseFail("bare colon")
    if value.endswith(":") and not has_trailing_colon:
        return s[i - 1:], value[:-1]
    if value == "-":
        return s[i:], None
    return s[i:], value


def _hostname(s):
    return _optional(s, has_colons=True, has_trailing_colon=False)


def _tagname(s):
    return _optional(s, has_colons=False, has_trailing_colon=True)


def _field_5424(s):  # appname / procid / msgid (parsers.rs:68-98)
    return _optional(s, has_colons=True, has_trailing_colon=True)


_I32_RE = re.compile(r"[+-]?[0-9]+")


def _procid_from(tok: str) -> Tuple[Optional[int], Optional[str]]:
    """ProcId::from<&str> (procid.rs:28-35): i32 parse or fall back to Name.
    Overflowing i32 falls back to Name as well; leading zeros are fine
    ('+0004' is PID 4) and huge runs can't crash int() (see u_digits)."""
    if _I32_RE.fullmatch(tok):
        sign = -1 if tok[0] == "-" else 1
        mag = u_digits(tok.lstrip("+-"), 2**31)
        if mag is not None:
            v = sign * mag
            if I32_MIN <= v <= I32_MAX:
                return v, None
    return None, tok


# ---------------------------------------------------------------------------
# timestamps (timestamp.rs)
# ---------------------------------------------------------------------------

# ASCII digits only ([0-9], not Unicode-aware \d) — chrono's RFC3339 parser
# accepts ASCII digits exclusively.
_RFC3339_RE = re.compile(
    r"([0-9]{4})-([0-9]{2})-([0-9]{2})[Tt]"
    r"([0-9]{2}):([0-9]{2}):([0-9]{2})(\.[0-9]+)?"
    r"([Zz]|[+-][0-9]{2}:[0-9]{2})\Z"
)


def parse_rfc3339(tok: str) -> datetime:
    """Strict RFC3339 (chrono parse_from_rfc3339 analogue).  Sub-second
    precision is truncated to microseconds (chrono keeps nanoseconds; the
    reference corpus never exceeds 6 digits).

    Leap second parity (timestamp.rs:14-22): chrono accepts ':60' and
    stores it as second 59 with nanos >= 10^9, so in epoch terms the
    instant equals the next minute's start plus the fraction.  Python
    datetimes cannot hold a 61st second, so the fold is applied here
    directly (sec 59 + 1 s) — the resulting datetime has the exact epoch
    microseconds chrono's timestamp_micros() would report.  The single
    instant 9999-12-31T23:59:60 folds past datetime.max (chrono accepts
    it; year 10000 is unrepresentable here) -> ParseFail, mirrored by the
    engine's wall-bound check (documented in COVERAGE.md)."""
    m = _RFC3339_RE.match(tok)
    if not m:
        raise ParseFail("rfc3339")
    y, mo, d, h, mi, sec = (int(m.group(i)) for i in range(1, 7))
    frac = m.group(7)
    us = 0
    if frac:
        # pad to 6 digits / truncate beyond microseconds (chrono keeps
        # nanoseconds; we standardize on Spark's microsecond timestamps)
        us = int(frac[1:7].ljust(6, "0"))
    off = m.group(8)
    if off in ("Z", "z"):
        offset = 0
    else:
        oh, om = int(off[1:3]), int(off[4:6])
        if oh > 23 or om > 59:
            raise ParseFail("offset range")
        offset = (oh * 3600 + om * 60) * (1 if off[0] == "+" else -1)
    leap = sec == 60
    if leap:
        sec = 59
    try:
        dt = datetime(y, mo, d, h, mi, sec, us,
                      tzinfo=timezone(timedelta(seconds=offset)))
        if leap:
            dt += timedelta(seconds=1)
        return dt
    except (ValueError, OverflowError) as e:
        raise ParseFail(str(e))


def _timestamp_3339(s: str) -> Tuple[str, Optional[datetime]]:
    """timestamp.rs:14-22: '-' -> None, else take_until(' ') + RFC3339.
    Note take_until requires a later space — a timestamp at end-of-input
    does NOT parse."""
    if s.startswith("-"):
        return s[1:], None
    idx = s.find(" ")
    if idx == -1:
        raise ParseFail("take_until space")
    return s[idx:], parse_rfc3339(s[:idx])


def _parse_month(tok: str) -> int:
    m = MONTHS.get(tok.lower())
    if m is None:
        raise ParseFail("month")
    return m


def _timestamp_3164_no_year(s: str) -> Tuple[str, Tuple[int, int, int, int, int]]:
    """MMM DD HH:MM:SS with optional trailing ':' (timestamp.rs:47-64)."""
    if len(s) < 3:
        raise ParseFail("take3")
    mon = _parse_month(s[:3])
    rest = _space1(s[3:])
    rest, d = _digits(rest, U32_MAX)
    rest = _space1(rest)
    rest, h = _digits(rest, U32_MAX)
    if not rest.startswith(":"):
        raise ParseFail(":")
    rest, mi = _digits(rest[1:], U32_MAX)
    if not rest.startswith(":"):
        raise ParseFail(":")
    rest, sec = _digits(rest[1:], U32_MAX)
    if rest.startswith(":"):
        rest = rest[1:]
    return rest, (mon, d, h, mi, sec)


def _timestamp_3164_with_year(s: str) -> Tuple[str, datetime]:
    """MMM DD YYYY HH:MM:SS (timestamp.rs:67-91); invalid calendar dates
    fail the parse."""
    if len(s) < 3:
        raise ParseFail("take3")
    mon = _parse_month(s[:3])
    rest = _space1(s[3:])
    rest, d = _digits(rest, U32_MAX)
    rest = _space1(rest)
    rest, y = _digits(rest, U32_MAX)
    rest = _space1(rest)
    rest, h = _digits(rest, U32_MAX)
    if not rest.startswith(":"):
        raise ParseFail(":")
    rest, mi = _digits(rest[1:], U32_MAX)
    if not rest.startswith(":"):
        raise ParseFail(":")
    rest, sec = _digits(rest[1:], U32_MAX)
    if rest.startswith(":"):
        rest = rest[1:]
    try:
        naive = datetime(y, mon, d, h, mi, sec)
    except ValueError as e:
        raise ParseFail(str(e))
    return rest, naive


def zone_earliest(naive: datetime, zone) -> Optional[datetime]:
    """chrono ``LocalResult::earliest()`` analogue for a naive local time
    in an IANA zone: ambiguous (fall-back) times resolve to the
    pre-transition offset (PEP 495 fold=0); nonexistent (spring-forward
    gap) times return None — the caller fails the parse, exactly like
    make_timestamp's ``.ok_or("invalid date")`` (timestamp.rs:106-112).

    OverflowError (the zone-shifted wall clock leaves Python's
    year-1..9999 datetime range) is also a parse failure, never a crash —
    the same policy as the documented >9999-year deviation.  chrono would
    parse these (its range is ±262143); see COVERAGE.md."""
    d0 = naive.replace(tzinfo=zone, fold=0)
    d1 = naive.replace(tzinfo=zone, fold=1)
    if d0.utcoffset() < d1.utcoffset():
        return None  # DST gap: the local time does not exist
    # fixed-offset view of the instant (datetime.offset().fix())
    try:
        return d0.astimezone(timezone(d0.utcoffset()))
    except OverflowError:
        return None


def zone_offset_from_utc(naive: datetime, zone) -> int:
    """chrono ``tz.offset_from_utc_datetime(&naive)`` analogue: the zone's
    UTC offset in seconds at the instant naive-interpreted-as-UTC.

    Raises ParseFail when the zone conversion overflows Python's datetime
    range (e.g. Jan 1 year 1 viewed in a west-of-UTC zone, or Dec 31 year
    9999 in an east-of-UTC zone): overflow = parse failure, never a crash,
    mirroring the documented >9999-year deviation from chrono."""
    inst = naive.replace(tzinfo=timezone.utc)
    try:
        return int(inst.astimezone(zone).utcoffset().total_seconds())
    except OverflowError:
        raise ParseFail("zone conversion outside datetime range")


def _timestamp_3164(s: str, cfg: ParseConfig) -> Tuple[str, Optional[datetime]]:
    """Ordered alternatives: no-year -> with-year -> RFC3339
    (timestamp.rs:131-161).  Timezone semantics replicated exactly:

    * no-year  + tz: the naive local time is interpreted IN the zone
      (make_timestamp, timestamp.rs:106-112); with a named zone, DST
      resolution is earliest-on-ambiguity, fail-on-gap
    * with-year + tz: the naive time is attached to the zone's offset as if
      it were UTC (timestamp.rs:141-146 uses from_naive_utc_and_offset) —
      the instant is naive@UTC shown at the offset (for a named zone, the
      offset the zone has at that UTC instant)
    * tz None (reference: system-local, lib.rs:122) is pinned to UTC
    """
    from .config import year_resolver

    zone = cfg.zone
    tz = timezone(timedelta(seconds=cfg.effective_offset))
    # NB: named-zone mode never reaches the explicit_tz branch (branch 2
    # returns earlier under `zone is not None`)
    explicit_tz = cfg.tz_offset_seconds is not None
    year_fn = year_resolver(cfg.year_policy)
    # branch 1: no year
    try:
        rest, (mon, d, h, mi, sec) = _timestamp_3164_no_year(s)
        year = year_fn(mon, d, h, mi, sec)
        try:
            local = datetime(year, mon, d, h, mi, sec)
        except ValueError as e:
            raise ParseFail(str(e))
        if zone is not None:
            resolved = zone_earliest(local, zone)
            if resolved is None:
                raise ParseFail("nonexistent local time (DST gap)")
            return rest, resolved
        return rest, local.replace(tzinfo=tz)
    except ParseFail:
        pass
    # branch 2: with year
    try:
        rest, naive = _timestamp_3164_with_year(s)
        if zone is not None:
            off = zone_offset_from_utc(naive, zone)
            return rest, naive.replace(tzinfo=timezone.utc).astimezone(
                timezone(timedelta(seconds=off)))
        if explicit_tz:
            # reference quirk: naive treated as UTC, offset merely attached
            return rest, naive.replace(tzinfo=timezone.utc).astimezone(tz)
        return rest, naive.replace(tzinfo=tz)  # Local pinned to UTC
    except ParseFail:
        pass
    except OverflowError:
        # wall clock at the attached offset leaves year 1..9999 (e.g.
        # 'Dec 31 9999 23:59:59' at +09:00): overflow = parse failure,
        # never a crash — same policy as the >9999-year deviation.
        pass
    # branch 3: full RFC3339 inside a 3164 envelope (tests/tests.rs:693-725)
    return _timestamp_3339(s)


# ---------------------------------------------------------------------------
# structured data (structured_data.rs)
# ---------------------------------------------------------------------------

def _param_value(s: str) -> Tuple[str, str]:
    """'"'-delimited with '\\' escaping anychar; '""' special-cased
    (structured_data.rs:117-129).  The RAW text between the quotes is kept;
    escape *stripping* is a separate view (strip_sd_escapes)."""
    if s.startswith('""'):
        return s[2:], ""
    if not s.startswith('"'):
        raise ParseFail('"')
    i = 1
    n = len(s)
    consumed = False
    while i < n:
        c = s[i]
        if c == "\\":
            if i + 1 >= n:
                raise ParseFail("dangling escape")
            i += 2
            consumed = True
        elif c != '"':
            i += 1
            consumed = True
        else:
            break
    if not consumed or i >= n or s[i] != '"':
        raise ParseFail("unterminated value")
    return s[i + 1:], s[1:i]


def _param(s: str) -> Tuple[str, Tuple[str, str]]:
    """key="value" with space allowed after '=' (structured_data.rs:132-139).
    The key is take_till1(']' | '='), so it may legally contain spaces."""
    i = 0
    while i < len(s) and s[i] not in "]=":
        i += 1
    if i == 0:
        raise ParseFail("key")
    key = s[:i]
    rest = s[i:]
    if not rest.startswith("="):
        raise ParseFail("=")
    rest = _space0(rest[1:])
    rest, value = _param_value(rest)
    return rest, (key, value)


def _sd_datum(s: str, allow_failure: bool, allow_empty: bool
              ) -> Tuple[str, Optional[Tuple[str, List[Tuple[str, str]]]]]:
    """One [id k="v" ...] element (structured_data.rs:149-211)."""
    def strict(s2: str):
        if not s2.startswith("["):
            raise ParseFail("[")
        r = s2[1:]
        i = 0
        while i < len(r) and not (r[i] in _WS_SET or r[i] in "]="):
            i += 1
        if i == 0:
            raise ParseFail("id")
        sd_id = r[:i]
        r = _space0(r[i:])
        params: List[Tuple[str, str]] = []
        try:
            r2, kv = _param(r)
            params.append(kv)
            r = r2
            while r.startswith(" "):
                try:
                    r2, kv = _param(r[1:])
                    params.append(kv)
                    r = r2
                except ParseFail:
                    break
        except ParseFail:
            pass
        if not r.startswith("]"):
            raise ParseFail("]")
        return r[1:], (sd_id, params)

    try:
        rest, elem = strict(s)
    except ParseFail:
        if not allow_failure:
            raise
        # permissive: swallow [anything-up-to-first-]] -> dropped element
        if not s.startswith("["):
            raise ParseFail("[")
        idx = s.find("]", 1)
        if idx == -1:
            raise ParseFail("]")
        rest, elem = s[idx + 1:], None
    # 3164 rejects parameterless elements so they stay in msg
    # (structured_data.rs:199-210)
    if not allow_empty and elem is not None and not elem[1]:
        raise ParseFail("empty element")
    return rest, elem


def _parse_structured_data(s: str, allow_failure: bool, allow_empty: bool
                           ) -> Tuple[str, List[Tuple[str, List[Tuple[str, str]]]]]:
    """'-' -> [] ; else many1 elements with Nones dropped
    (structured_data.rs:215-234)."""
    if s.startswith("-"):
        return s[1:], []
    out = []
    rest, elem = _sd_datum(s, allow_failure, allow_empty)
    if elem is not None:
        out.append(elem)
    while True:
        try:
            rest2, elem = _sd_datum(rest, allow_failure, allow_empty)
        except ParseFail:
            break
        rest = rest2
        if elem is not None:
            out.append(elem)
    return rest, out


def strip_sd_escapes(value: str) -> str:
    """The params() escape-stripping view (structured_data.rs:84-114):
    \\" -> ", \\] -> ], \\\\ -> \\, \\n -> newline; any other \\x stays \\x."""
    out = []
    escaped = False
    for c in value:
        if c == "\\" and not escaped:
            escaped = True
        elif c == "n" and escaped:
            escaped = False
            out.append("\n")
        elif c not in ('"', "]", "\\") and escaped:
            escaped = False
            out.append("\\")
            out.append(c)
        else:
            escaped = False
            out.append(c)
    return "".join(out)


# ---------------------------------------------------------------------------
# RFC5424 (rfc5424.rs:21-72)
# ---------------------------------------------------------------------------

def _parse_rfc5424(s: str) -> Message:
    rest, (fac, sev) = _pri(s)
    rest, version = _digits(rest, U32_MAX)
    rest = _space1(rest)
    rest, ts = _timestamp_3339(rest)
    rest = _space1(rest)
    rest, host = _hostname(rest)
    rest = _space1(rest)
    rest, app = _field_5424(rest)
    rest = _space1(rest)
    rest, proc = _field_5424(rest)
    rest = _space1(rest)
    rest, mid = _field_5424(rest)
    rest = _space0(rest)
    rest, sd = _parse_structured_data(rest, allow_failure=True,
                                      allow_empty=True)
    rest = _space0(rest)
    pid, pname = _procid_from(proc) if proc is not None else (None, None)
    return Message(
        protocol="RFC5424", version=version, facility=fac, severity=sev,
        timestamp=ts, hostname=host, appname=app, procid_pid=pid,
        procid_name=pname, msgid=mid, structured_data=sd, msg=rest,
    )


# ---------------------------------------------------------------------------
# RFC3164 (rfc3164.rs:19-104)
# ---------------------------------------------------------------------------

_SYSTAG_RE = re.compile(r"((?:[^\s:\[]|[\x1c-\x1f])*)\[([^\]]+)\]\Z")


def _resolve_host_and_tag(f1, f2):
    """rfc3164.rs:35-61.  f1/f2 are three-state: _ABSENT, None ('-'), str."""
    def systag_full(tok: str):
        m = _SYSTAG_RE.match(tok)
        return (m.group(1), m.group(2)) if m else None

    if f1 is not _ABSENT and f2 is not _ABSENT and f2 is not None:
        st = systag_full(f2)
        host = f1  # may be None ('-')
        if st:
            return host, st[0], st[1]
        return host, f2, None
    if f1 is not _ABSENT and f1 is not None and f2 is _ABSENT:
        st = systag_full(f1)
        if st:
            return None, st[0], st[1]
        return f1, None, None
    if f1 is _ABSENT and f2 is not _ABSENT and f2 is not None:
        st = systag_full(f2)
        if st:
            return None, st[0], st[1]
        return f2, None, None
    return None, None, None


_ABSENT = object()


def _parse_rfc3164(s: str, cfg: ParseConfig) -> Message:
    rest, (fac, sev) = _pri(s)
    rest = _space0(rest)
    rest, ts = _timestamp_3164(rest, cfg)

    f1 = _ABSENT
    if rest.startswith(" "):
        try:
            r2, v = _hostname(rest[1:])
            f1, rest = v, r2
        except ParseFail:
            pass
    f2 = _ABSENT
    if rest.startswith(" "):
        try:
            r2, v = _tagname(rest[1:])
            f2, rest = v, r2
        except ParseFail:
            pass
    rest = _space0(rest)
    if rest.startswith(":"):
        rest = rest[1:]
    rest = _space0(rest)
    sd: List[Tuple[str, List[Tuple[str, str]]]] = []
    try:
        r2, sd2 = _parse_structured_data(rest, allow_failure=False,
                                         allow_empty=False)
        rest, sd = r2, sd2
    except ParseFail:
        pass
    rest = _space0(rest)

    host, app, pid_tok = _resolve_host_and_tag(f1, f2)
    pid, pname = _procid_from(pid_tok) if pid_tok is not None else (None, None)
    return Message(
        protocol="RFC3164", version=None, facility=fac, severity=sev,
        timestamp=ts, hostname=host, appname=app, procid_pid=pid,
        procid_name=pname, msgid=None, structured_data=sd, msg=rest,
    )


# ---------------------------------------------------------------------------
# entry points (lib.rs:36-175)
# ---------------------------------------------------------------------------

def parse_message_exact(raw: str, cfg: ParseConfig = ParseConfig()) -> Message:
    """Strict parse — raises ParseFail like the *_exact entry points
    (lib.rs:137-175)."""
    trimmed = raw.strip(REF_WS)   # str::trim == White_Space (lib.rs:47)
    if cfg.variant == VARIANT_RFC5424:
        return _parse_rfc5424(trimmed)
    if cfg.variant == VARIANT_RFC3164:
        return _parse_rfc3164(trimmed, cfg)
    if cfg.variant != VARIANT_EITHER:
        raise ValueError(f"unknown variant {cfg.variant}")
    try:
        return _parse_rfc5424(trimmed)
    except ParseFail:
        return _parse_rfc3164(trimmed, cfg)


def parse_message(raw: str, cfg: ParseConfig = ParseConfig()) -> Message:
    """Tolerant parse: on failure the whole *untrimmed* input becomes msg
    with all other fields null (lib.rs:77-92)."""
    try:
        return parse_message_exact(raw, cfg)
    except ParseFail:
        return Message(protocol="RFC3164", msg=raw)


# ---------------------------------------------------------------------------
# canonical serializer (message.rs:28-88) — round-trip property tests
# ---------------------------------------------------------------------------

def _ts_rfc3339(ts: datetime) -> str:
    """chrono to_rfc3339 (SecondsFormat::AutoSi at microsecond granularity):
    no fraction when zero, 3 digits when millisecond-aligned, else 6."""
    us = ts.microsecond
    if us == 0:
        frac = ""
    elif us % 1000 == 0:
        frac = f".{us // 1000:03d}"
    else:
        frac = f".{us:06d}"
    off = ts.utcoffset() or timedelta(0)
    total = int(off.total_seconds())
    sign = "+" if total >= 0 else "-"
    total = abs(total)
    return (f"{ts.year:04d}-{ts.month:02d}-{ts.day:02d}T"
            f"{ts.hour:02d}:{ts.minute:02d}:{ts.second:02d}{frac}"
            f"{sign}{total // 3600:02d}:{(total % 3600) // 60:02d}")


def serialize_message(m: Message) -> str:
    """Canonical Display re-emission (message.rs:28-88)."""
    pri = compose_pri(m.facility if m.facility is not None else 5,   # LOG_SYSLOG
                      m.severity if m.severity is not None else 7)   # SEV_DEBUG
    ver = str(m.version) if m.protocol == "RFC5424" else ""
    ts = _ts_rfc3339(m.timestamp) if m.timestamp is not None else "-"
    host = m.hostname if m.hostname is not None else "-"
    out = [f"<{pri}>{ver} {ts} {host} "]
    procid = (str(m.procid_pid) if m.procid_pid is not None
              else m.procid_name)
    if m.protocol == "RFC5424":
        out.append(f"{m.appname if m.appname is not None else '-'} ")
        out.append(f"{procid} " if procid is not None else "- ")
        out.append(f"{m.msgid if m.msgid is not None else '-'} ")
    else:
        if m.appname is not None and procid is not None:
            out.append(f"{m.appname}[{procid}]: ")
        elif m.appname is not None:
            out.append(f"{m.appname}: ")
        else:
            out.append(": ")
    if not m.structured_data:
        if m.protocol == "RFC5424":
            out.append("- ")
    else:
        for sd_id, params in m.structured_data:
            out.append(f"[{sd_id}")
            for k, v in params:
                out.append(f' {k}="{v}"')
            out.append("]")
        out.append(" ")
    out.append(m.msg)
    return "".join(out)
