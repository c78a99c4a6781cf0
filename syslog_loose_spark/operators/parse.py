"""Vectorized tolerant-syslog parse for Spark (Arrow-batched, no row UDFs).

The engine core: compiled *possessive* master regexes replicate the
committed-choice behavior of the reference's nom combinator grammar
(/root/reference/src/{rfc5424,rfc3164,timestamp,structured_data,parsers}.rs)
— possessive quantifiers (`++`, `*+`, `?+`) are the regex analogue of nom's
no-backtracking-within-an-alternative execution, which is what makes one
regex pass per protocol semantically equal to the combinator sequence.

Exposed as:
  * ``parse_tokenized(df, cfg)``   — mapInPandas over the tokenized input
    table (detokenize + parse in one Arrow pass; the job's only
    JVM→Python boundary)
  * ``parse_syslog_udf(cfg)``      — scalar pandas_udf: string -> struct

Semantics are verified row-for-row against the independent plain-Python
oracle (syslog_loose_spark.oracle) in tests/test_parse_vectorized.py,
including a Hypothesis round-trip property.
"""

from __future__ import annotations

import re
from datetime import datetime, timedelta, timezone
from typing import Iterator, List, Optional, Tuple

import numpy as np
import pandas as pd

from ..config import ParseConfig, VARIANT_EITHER, VARIANT_RFC3164, VARIANT_RFC5424
from ..oracle import MONTHS, parse_rfc3339, ParseFail

U32_MAX = 4294967295
I32_MIN, I32_MAX = -(2**31), 2**31 - 1
_UTC = timezone.utc

# --------------------------------------------------------------------------
# master regexes
# --------------------------------------------------------------------------

# One structured-data param: key (take_till1 ']'/'=' — may contain spaces,
# structured_data.rs:132-139), '=', optional spaces, quoted value with
# '\'-anychar escaping ('""' special-cased, structured_data.rs:117-129).
_PARAM = r'[^\]=]++=[ \t]*+(?:""|"(?:[^"\\]++|\\.)++")'

# Strict SD element (structured_data.rs:149-166): id then space0 then
# space-separated params.  The {params} inner group is reused for both the
# "must have params" (3164) and "params optional" (5424) variants.
_ELEM_STRICT_5424 = rf'\[[^\s\]=]++[ \t]*+(?:{_PARAM}(?: {_PARAM})*+)?+\]'
_ELEM_STRICT_3164 = rf'\[[^\s\]=]++[ \t]*+{_PARAM}(?: {_PARAM})*+\]'
# Permissive fallback (structured_data.rs:169-179): anything up to first ']'.
_ELEM_PERMISSIVE = r'\[[^\]]*+\]'

# Full RFC5424 line after the PRI (rfc5424.rs:21-72).  Field tokens are
# possessive \S++ (= take_while1 non-whitespace, parsers.rs:25-43);
# '-' timestamps must be followed by space1 or the alternative is committed
# and the parse fails (nom alt does not backtrack out of tag("-")).
_RX5424 = re.compile(
    r'\A(?P<ver>\d++)'
    r'[ \t]++'
    r'(?P<ts>-(?=[ \t])|[^ ]++)'
    r'[ \t]++'
    r'(?P<host>\S++)'
    r'[ \t]++'
    r'(?P<app>\S++)'
    r'[ \t]++'
    r'(?P<proc>\S++)'
    r'[ \t]++'
    r'(?P<msgid>\S++)'
    r'[ \t]*+'
    rf'(?P<sd>-|(?:{_ELEM_STRICT_5424}|{_ELEM_PERMISSIVE})++)'
    r'[ \t]*+'
    r'(?P<msg>.*)\Z',
    re.S,
)

# RFC3164 timestamps (timestamp.rs:47-91): month = take(3) any 3 chars
# validated against the month table; digits possessive; optional trailing
# ':' after the seconds.
_RX_TS_NOYEAR = re.compile(
    r'\A(?P<mon>.{3})[ \t]++(?P<d>\d++)[ \t]++'
    r'(?P<h>\d++):(?P<mi>\d++):(?P<s>\d++):?'
)
_RX_TS_WITHYEAR = re.compile(
    r'\A(?P<mon>.{3})[ \t]++(?P<d>\d++)[ \t]++(?P<y>\d++)[ \t]++'
    r'(?P<h>\d++):(?P<mi>\d++):(?P<s>\d++):?'
)

# RFC3164 header tail after the timestamp (rfc3164.rs:72-85):
#   opt(" " hostname) opt(" " tagname) space0 opt(":") space0 opt(SD) space0 rest
# f1 encodes the hostname trailing-colon split-back (parsers.rs:32-36): a
# ':' is part of the token only when followed by non-whitespace, so a
# trailing ':' is left in the input as the header/msg separator.
_RX3164_TAIL = re.compile(
    # NOTE: no \A — matched via .match(h, pos) which anchors at pos, while
    # \A would still refer to the absolute start of the string.
    r'(?: (?P<f1>(?:[^\s:]|:(?=\S))++))?+'
    r'(?: (?P<f2>[^\s:]++))?+'
    r'[ \t]*+'
    r'(?::)?+'
    r'[ \t]*+'
    rf'(?P<sd>-|(?:{_ELEM_STRICT_3164})++)?+'
    r'[ \t]*+'
    r'(?P<msg>.*)\Z',
    re.S,
)

# element/param sub-scanners used to decompose an already-matched SD region
_RX_ELEM = re.compile(
    rf'\[(?P<id>[^\s\]=]++)[ \t]*+'
    rf'(?P<params>(?:{_PARAM}(?: {_PARAM})*+)?+)\]'
    rf'|(?P<junk>{_ELEM_PERMISSIVE})'
)
_RX_PARAM = re.compile(r'(?P<k>[^\]=]++)=[ \t]*+(?P<v>""|"(?:[^"\\]++|\\.)++")')

_RX_PRI = re.compile(r'\A<(\d++)>')
_RX_I32 = re.compile(r'[+-]?[0-9]+\Z')
_RX_SYSTAG = re.compile(r'([^\s:\[]*+)\[([^\]]++)\]\Z')


def _sd_elements(sd: str) -> List[Tuple[str, List[Tuple[str, str]]]]:
    """Decompose a regex-validated SD region into (id, [(k, raw_v)]).
    Permissive (dropped) elements yield nothing."""
    if sd == "-" or not sd:
        return []
    out = []
    pos = 0
    n = len(sd)
    while pos < n:
        m = _RX_ELEM.match(sd, pos)
        if m is None:  # cannot happen for a region the master regex matched
            break
        pos = m.end()
        if m.group("id") is None:
            continue
        blob = m.group("params")
        params: List[Tuple[str, str]] = []
        p = 0
        while True:
            pm = _RX_PARAM.match(blob, p)
            if pm is None:
                break
            v = pm.group("v")
            params.append((pm.group("k"), "" if v == '""' else v[1:-1]))
            p = pm.end()
            if p < len(blob) and blob[p] == " ":
                p += 1
            else:
                break
        out.append((m.group("id"), params))
    return out


def _procid(tok: str) -> Tuple[Optional[int], Optional[str]]:
    """ProcId::from (procid.rs:28-35): i32 or Name; overflow -> Name."""
    if _RX_I32.match(tok):
        v = int(tok)
        if I32_MIN <= v <= I32_MAX:
            return v, None
    return None, tok


class _Fail(Exception):
    pass


def _parse_5424(h: str):
    """h = input after PRI removal.  Raises _Fail to fall through to 3164."""
    m = _RX5424.match(h)
    if m is None:
        raise _Fail
    ver = int(m.group("ver"))
    if ver > U32_MAX:
        raise _Fail
    tok = m.group("ts")
    if tok == "-":
        ts = None
    else:
        try:
            ts = parse_rfc3339(tok)
        except ParseFail:
            raise _Fail
    host = m.group("host")
    # hostname disallows a trailing ':' (parsers.rs:46-54): the colon would
    # be split back and the following space1 in the sequence then fails.
    if host == ":" or host.endswith(":"):
        raise _Fail
    fields = []
    for g in ("app", "proc", "msgid"):
        tok = m.group(g)
        if tok == ":":
            raise _Fail
        fields.append(None if tok == "-" else tok)
    app, proc, msgid = fields
    host = None if host == "-" else host
    pid, pname = _procid(proc) if proc is not None else (None, None)
    sd = _sd_elements(m.group("sd"))
    return (ver, ts, host, app, pid, pname, msgid, sd, m.group("msg"))


_ABSENT = object()


def _resolve_host_tag(f1, f2):
    """rfc3164.rs:35-61 — see oracle._resolve_host_and_tag (independently
    re-derived here in regex form)."""
    def systag(tok):
        m = _RX_SYSTAG.match(tok)
        return (m.group(1), m.group(2)) if m else None

    if f1 is not _ABSENT and f2 is not _ABSENT and f2 is not None:
        st = systag(f2)
        return (f1, st[0], st[1]) if st else (f1, f2, None)
    if f1 is not _ABSENT and f1 is not None and f2 is _ABSENT:
        st = systag(f1)
        return (None, st[0], st[1]) if st else (f1, None, None)
    if f1 is _ABSENT and f2 is not _ABSENT and f2 is not None:
        st = systag(f2)
        return (None, st[0], st[1]) if st else (f2, None, None)
    return None, None, None


def _ts_3164(h: str, cfg: ParseConfig):
    """Ordered timestamp alternatives (timestamp.rs:131-161).
    Returns (ts_or_None, end_pos); raises _Fail when none parse."""
    tzoff = cfg.effective_offset
    tz = timezone(timedelta(seconds=tzoff)) if tzoff else _UTC
    m = _RX_TS_NOYEAR.match(h)
    if m is not None:
        mon = MONTHS.get(m.group("mon").lower())
        if mon is not None and len(m.group("d")) <= 10:
            try:
                local = datetime(cfg.year_policy(mon), mon, int(m.group("d")),
                                 int(m.group("h")), int(m.group("mi")),
                                 int(m.group("s")))
                return local.replace(tzinfo=tz), m.end()
            except ValueError:
                pass
    m = _RX_TS_WITHYEAR.match(h)
    if m is not None:
        mon = MONTHS.get(m.group("mon").lower())
        if mon is not None and max(len(m.group("d")), len(m.group("y"))) <= 10:
            try:
                naive = datetime(int(m.group("y")), mon, int(m.group("d")),
                                 int(m.group("h")), int(m.group("mi")),
                                 int(m.group("s")))
            except ValueError:
                naive = None
            if naive is not None:
                if cfg.tz_offset_seconds is not None:
                    # with-year + explicit tz quirk (timestamp.rs:141-146):
                    # naive attached to the offset as if it were UTC
                    return naive.replace(tzinfo=_UTC).astimezone(tz), m.end()
                return naive.replace(tzinfo=tz), m.end()
    if h.startswith("-"):
        return None, 1
    idx = h.find(" ")
    if idx == -1:
        raise _Fail
    try:
        return parse_rfc3339(h[:idx]), idx
    except ParseFail:
        raise _Fail


def _parse_3164(h: str, cfg: ParseConfig):
    h = h.lstrip(" \t")  # opt(space0) between PRI and timestamp, rfc3164.rs:74
    ts, pos = _ts_3164(h, cfg)
    m = _RX3164_TAIL.match(h, pos)
    if m is None:  # the tail regex is total; defensive only
        raise _Fail
    f1 = m.group("f1")
    f2 = m.group("f2")
    f1 = _ABSENT if f1 is None else (None if f1 == "-" else f1)
    f2 = _ABSENT if f2 is None else (None if f2 == "-" else f2)
    host, app, pid_tok = _resolve_host_tag(f1, f2)
    pid, pname = _procid(pid_tok) if pid_tok is not None else (None, None)
    sd = _sd_elements(m.group("sd") or "")
    return (ts, host, app, pid, pname, sd, m.group("msg"))


# row tuple layout (matches schema.SYSLOG_FIELDS order)
_FALLBACK_PREFIX = ("RFC3164", None, None, None, None, None, None, None,
                    None, None, None)


def parse_lines(lines, raws, cfg: ParseConfig):
    """Parse a batch.  ``lines`` are the trimmed-source strings (detokenized);
    ``raws`` the verbatim originals used for fallback msg (lib.rs:92).
    Returns a list of column-lists in SYSLOG_FIELDS order."""
    n = len(lines)
    cols = [[None] * n for _ in range(14)]
    (c_proto, c_ver, c_fac, c_sev, c_ts, c_off, c_host, c_app, c_pid,
     c_pname, c_msgid, c_sd, c_msg, c_ok) = cols
    try_5424 = cfg.variant in (VARIANT_EITHER, VARIANT_RFC5424)
    try_3164 = cfg.variant in (VARIANT_EITHER, VARIANT_RFC3164)
    for i in range(n):
        raw = raws[i]
        s = lines[i].strip()
        # PRI (pri.rs:178-184): u8 digits; overflow leaves input unconsumed
        fac = sev = None
        h = s
        pm = _RX_PRI.match(s)
        if pm is not None:
            v = int(pm.group(1))
            if v <= 255:
                f = v >> 3
                fac = f if f <= 23 else None
                sev = v & 7
                h = s[pm.end():]
        ok = False
        if try_5424:
            try:
                (ver, ts, host, app, pid, pname, msgid, sd, msg) = \
                    _parse_5424(h)
                c_proto[i], c_ver[i] = "RFC5424", ver
                c_host[i], c_app[i], c_pid[i], c_pname[i] = host, app, pid, pname
                c_msgid[i], c_sd[i], c_msg[i] = msgid, sd, msg
                if ts is not None:
                    c_off[i] = int(ts.utcoffset().total_seconds())
                    c_ts[i] = ts.astimezone(_UTC).replace(tzinfo=None)
                ok = True
            except _Fail:
                pass
        if not ok and try_3164:
            try:
                ts, host, app, pid, pname, sd, msg = _parse_3164(h, cfg)
                c_proto[i] = "RFC3164"
                c_host[i], c_app[i], c_pid[i], c_pname[i] = host, app, pid, pname
                c_sd[i], c_msg[i] = sd, msg
                if ts is not None:
                    c_off[i] = int(ts.utcoffset().total_seconds())
                    c_ts[i] = ts.astimezone(_UTC).replace(tzinfo=None)
                ok = True
            except _Fail:
                pass
        if ok:
            c_fac[i], c_sev[i] = fac, sev
            c_ok[i] = True
        else:
            # tolerant fallback (lib.rs:77-92): all nulls, msg = raw input
            c_proto[i], c_sd[i], c_msg[i], c_ok[i] = "RFC3164", [], raw, False
    return cols


def _cols_to_pdf(cols, extra: Optional[dict] = None) -> pd.DataFrame:
    data = dict(extra or {})
    names = ["protocol", "version", "facility", "severity", "ts",
             "tz_offset_seconds", "hostname", "appname", "procid_pid",
             "procid_name", "msgid", "structured_data", "msg", "parse_ok"]
    for name, col in zip(names, cols):
        if name == "ts":
            data[name] = pd.Series(col, dtype="datetime64[us]")
        elif name == "structured_data":
            data[name] = pd.Series(
                [None if v is None else
                 [{"id": e[0],
                   "params": [{"key": k, "value": val} for k, val in e[1]]}
                  for e in v]
                 for v in col], dtype=object)
        elif name in ("version",):
            data[name] = pd.Series(col, dtype="object")
        else:
            data[name] = pd.Series(col, dtype=object)
    return pd.DataFrame(data)


def detokenize_batch(tokens_col) -> List[str]:
    """array<int32> of UTF-8 byte values -> str, via one flat numpy buffer
    per Arrow batch (no per-character Python)."""
    import pyarrow as pa

    arr = pa.array(tokens_col, type=pa.list_(pa.int32()))
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.uint8)
    offs = arr.offsets.to_numpy(zero_copy_only=False)
    buf = flat.tobytes()
    return [buf[offs[j]:offs[j + 1]].decode("utf-8", "replace")
            for j in range(len(offs) - 1)]


def parse_tokenized(df, cfg: ParseConfig = ParseConfig()):
    """The pipeline parse stage: (doc_id, tokens, n_tok, source) ->
    PARSED_SCHEMA.  One mapInPandas pass = the only JVM→Python boundary in
    the job; tokens are carried through untouched so every routed row keeps
    byte equality with its input (BASELINE.json per-row invariant)."""
    from ..schema import PARSED_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            raws = detokenize_batch(pdf["tokens"])
            cols = parse_lines(raws, raws, cfg)
            out = _cols_to_pdf(cols, extra={
                "doc_id": pdf["doc_id"].to_numpy(dtype=object),
                "source": pdf["source"].to_numpy(dtype=object),
                "n_tok": pdf["n_tok"],
                "tokens": pdf["tokens"],
                "raw": raws,
            })
            yield out

    return df.mapInPandas(run, schema=PARSED_SCHEMA)


def parse_syslog_udf(cfg: ParseConfig = ParseConfig()):
    """Scalar Arrow UDF: string column -> SYSLOG_STRUCT (for ad-hoc use,
    mirroring parse_message, lib.rs:121-123)."""
    from pyspark.sql.functions import pandas_udf

    from ..schema import SYSLOG_STRUCT

    @pandas_udf(SYSLOG_STRUCT)
    def _parse(raw: pd.Series) -> pd.DataFrame:
        vals = raw.fillna("").tolist()
        return _cols_to_pdf(parse_lines(vals, vals, cfg))

    return _parse
