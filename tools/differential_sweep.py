#!/usr/bin/env python
"""Reusable differential fuzz sweep: vectorized engine vs per-row oracle.

Rounds 4 and 5 ran their 2M / 32M row-config sweeps from ad-hoc scripts;
this makes the sweep a one-command, reproducible artifact.  Generates
edge-biased syslog-ish lines (the bias classes that found every historical
divergence: `:60/:61` seconds, `+24:00`/`+00:60` offsets, boundary years
{0001, 1969, 9999}, 7-digit fractions, overflow PRI/version/pid, malformed
SD escapes, IPv6/underscore hosts, C0/multibyte noise) and checks
operators/parse.parse_lines field-for-field against oracle.parse_message
under 8 ParseConfigs (default, fixed offsets ±, two IANA DST zones, a full
year-policy tuple, both forced variants).

Usage:
  python tools/differential_sweep.py [lines_per_proc] [n_procs]
  # default 125000 x 32 = 4M lines -> 32M row-config comparisons

Prints one JSON line; exits 1 on any divergence (with the offending line).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MONTHS = ["Jan", "Feb", "Oct", "Dec", "oct", "OCT", "Xxx", "Ωct", "デec"]
HOSTS = ["host", "::1", "fe80::1%eth0", "my_host", "-", ":", "h\x1cx",
         "74794bfb6795", "hôst", "a" * 64, "10.0.0.1"]
APPS = ["app", "app[123]", "app[99999999999999999999]", "app[+42]",
        "app[]", "-", "rsyslogd", "kernel", "äpp", "su"]
SDS = ['-', '[id k="v"]', '[id k="a\\"] m', '[id k="\\"]',
       '[a][b]', '[a] [b]', '[bad unclosed', '[id ="x"]', '[id k= "v"]',
       '[id k="v1" k="v2"]', '[id k="a\\\nb"]', '[id ké="vé"]',
       '[id\x1cx k="v"]', '[id aa="hullo \\"there\\""]']
MSGS = ["msg body", "", "-", "-x", " leading space", "msg with \n newline",
        "trailing fs\x1f", "ünï müß", "m" * 300, "[id k=\"v\"] tail"]
NOISE = ["", " ", " ", "\x1c", " ", "\t"]


def _ts3339(r: random.Random) -> str:
    year = r.choice([1, 1969, 1970, 2003, 2020, 9999, 2016])
    mo = r.choice([1, 2, 10, 12, 13])
    d = r.choice([1, 11, 28, 29, 31, 32, 99])
    h = r.choice([0, 22, 23, 24])
    mi = r.choice([0, 14, 59, 60])
    sec = r.choice([0, 15, 59, 60, 61])
    frac = r.choice(["", ".003", ".5", ".999999999", ".0000007", "." ])
    off = r.choice(["Z", "z", "+00:00", "+05:30", "-08:00", "+24:00",
                    "+00:60", "+10:30", "-00:00"])
    return (f"{year:04d}-{mo:02d}-{d:02d}T{h:02d}:{mi:02d}:{sec:02d}"
            f"{frac}{off}")


def _ts3164(r: random.Random) -> str:
    mon = r.choice(MONTHS)
    day = r.choice(["1", " 1", "11", "28", "29", "31", "99", "١١"])
    year = r.choice(["", " 2008", " 0001", " 9999", " 2020"])
    t = (f"{r.choice([0, 16, 23, 24]):02d}:{r.choice([0, 49, 59, 60]):02d}"
         f":{r.choice([0, 7, 59, 60, 61]):02d}")
    return f"{mon} {day}{year} {t}"


def gen_line(r: random.Random) -> str:
    pri = r.choice(["<34>", "<0>", "<191>", "<192>", "<256>", "<>",
                    "<-1>", "<3٤>", "<" + "0" * r.choice([1, 50]) + "34>",
                    ""])
    kind = r.randrange(6)
    host, app, msg = r.choice(HOSTS), r.choice(APPS), r.choice(MSGS)
    lead, trail = r.choice(NOISE), r.choice(NOISE)
    if kind == 0:       # RFC 5424
        ver = r.choice(["1", "2", "99999999999", "١", "0"])
        ts = r.choice(["-", "-x", _ts3339(r)])
        sd = r.choice(SDS)
        body = f"{pri}{ver} {ts} {host} {app} - - {sd} {msg}"
    elif kind == 1:     # RFC 3164
        body = f"{pri}{_ts3164(r)} {host} {app}: {msg}"
    elif kind == 2:     # 3339-in-3164 envelope
        body = f"{pri}{_ts3339(r)} {host} {app}: {msg}"
    elif kind == 3:     # tagless / bare-colon shapes
        body = f"{pri}{_ts3164(r)} {r.choice([':', '-:', '- :', '-'])} {msg}"
    elif kind == 4:     # plain noise / no PRI
        body = f"{_ts3164(r)} {host} {app}: {msg}"
    else:               # fragments cut mid-grammar
        full = f"{pri}1 {_ts3339(r)} {host} {app} - - [id k=\"v\"] {msg}"
        body = full[:r.randrange(1, max(2, len(full)))]
    return f"{lead}{body}{trail}"


def _configs():
    from syslog_loose_spark.config import ParseConfig

    return [
        ParseConfig(),
        ParseConfig(tz_offset_seconds=5 * 3600 + 1800),
        ParseConfig(tz_offset_seconds=-8 * 3600),
        ParseConfig(tz_name="America/New_York"),
        ParseConfig(tz_name="Australia/Lord_Howe"),
        ParseConfig(year_policy=lambda *a: 2019),
        ParseConfig(variant="rfc3164"),
        ParseConfig(variant="rfc5424"),
    ]


def _norm_ts(ts):
    from datetime import datetime, timezone

    if ts is None:
        return None
    td = ts - datetime(1970, 1, 1, tzinfo=timezone.utc)
    return (td.days * 86400 + td.seconds) * 1_000_000 + td.microseconds


def worker(args):
    seed, n = args
    from syslog_loose_spark.operators.parse import parse_lines
    from syslog_loose_spark.oracle import parse_message

    r = random.Random(seed)
    rows = [gen_line(r) for _ in range(n)]
    total = 0
    for cfg in _configs():
        cols = parse_lines(rows, rows, cfg)
        (c_proto, c_ver, c_fac, c_sev, c_ts, c_off, c_host, c_app, c_pid,
         c_pname, c_msgid, c_sd, c_msg, c_ok) = cols
        for i, raw in enumerate(rows):
            om = parse_message(raw, cfg)
            o_off = (None if om.timestamp is None else
                     int(om.timestamp.utcoffset().total_seconds()))
            e_off = c_off[i] if c_ts[i] is not None else None
            eng = (c_proto[i], c_ver[i], c_fac[i], c_sev[i], c_ts[i],
                   e_off, c_host[i], c_app[i], c_pid[i], c_pname[i],
                   c_msgid[i], c_sd[i], c_msg[i])
            ora = (om.protocol, om.version, om.facility, om.severity,
                   _norm_ts(om.timestamp), o_off, om.hostname, om.appname,
                   om.procid_pid, om.procid_name, om.msgid,
                   om.structured_data, om.msg)
            if eng != ora:
                return {"divergence": {"line": raw, "engine": repr(eng),
                                       "oracle": repr(ora),
                                       "cfg": repr(cfg)}}
            total += 1
    return {"comparisons": total}


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 125_000
    procs = int(sys.argv[2]) if len(sys.argv) > 2 else (os.cpu_count() or 8)
    t0 = time.time()
    with mp.Pool(procs) as pool:
        results = pool.map(worker, [(1000 + i, n) for i in range(procs)])
    bad = [r for r in results if "divergence" in r]
    total = sum(r.get("comparisons", 0) for r in results)
    out = {"kind": "differential_sweep", "lines": n * procs,
           "configs": 8, "comparisons": total,
           "divergences": len(bad), "wall_sec": round(time.time() - t0, 1)}
    if bad:
        out["first"] = bad[0]["divergence"]
    print(json.dumps(out))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
