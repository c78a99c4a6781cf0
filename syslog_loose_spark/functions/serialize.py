"""Canonical syslog re-emission (Display, message.rs:28-88) as a pure JVM
column expression — the Spark-side twin of oracle.serialize_message, used
for round-trip testing and for emitting normalized lines to downstream
consumers without a Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _ts_rfc3339_col(ts: Column, off: Column) -> Column:
    """chrono to_rfc3339 with AutoSi fraction (none / millis / micros) at a
    fixed offset.  ``ts`` is the UTC instant, ``off`` the offset seconds."""
    local = ts + F.make_interval(secs=off.cast("double"))
    # pmod, not %: unix_micros is negative for pre-1970 instants and a
    # negative remainder would emit a malformed fraction like '.-500'
    us = F.pmod(F.unix_micros(ts), F.lit(1_000_000))
    frac = (
        F.when(us == 0, F.lit(""))
        .when(us % 1000 == 0,
              F.format_string(".%03d", (us / 1000).cast("int")))
        .otherwise(F.format_string(".%06d", us.cast("int")))
    )
    ao = F.abs(off)
    off_s = F.concat(
        F.when(off < 0, F.lit("-")).otherwise(F.lit("+")),
        F.format_string("%02d:%02d", (ao / 3600).cast("int"),
                        ((ao % 3600) / 60).cast("int")),
    )
    return F.concat(F.date_format(local, "yyyy-MM-dd'T'HH:mm:ss"),
                    frac, off_s)


def serialize_syslog(protocol: Column, version: Column, facility: Column,
                     severity: Column, ts: Column, tz_off: Column,
                     hostname: Column, appname: Column, procid_pid: Column,
                     procid_name: Column, msgid: Column, sd: Column,
                     msg: Column) -> Column:
    """Rebuild the canonical line from the parsed columns."""
    pri = (F.coalesce(facility, F.lit(5)) * 8
           + F.coalesce(severity, F.lit(7)))  # LOG_SYSLOG / SEV_DEBUG
    is5424 = protocol == "RFC5424"
    ver = F.when(is5424, version.cast("string")).otherwise(F.lit(""))
    ts_s = F.when(ts.isNull(), F.lit("-")).otherwise(
        _ts_rfc3339_col(ts, F.coalesce(tz_off, F.lit(0))))
    host = F.coalesce(hostname, F.lit("-"))
    procid = F.coalesce(procid_pid.cast("string"), procid_name)

    head = F.concat(F.lit("<"), pri.cast("string"), F.lit(">"), ver,
                    F.lit(" "), ts_s, F.lit(" "), host, F.lit(" "))
    mid_5424 = F.concat(
        F.coalesce(appname, F.lit("-")), F.lit(" "),
        F.coalesce(procid, F.lit("-")), F.lit(" "),
        F.coalesce(msgid, F.lit("-")), F.lit(" "))
    mid_3164 = (
        F.when(appname.isNotNull() & procid.isNotNull(),
               F.concat(appname, F.lit("["), procid, F.lit("]: ")))
        .when(appname.isNotNull(), F.concat(appname, F.lit(": ")))
        .otherwise(F.lit(": ")))

    sd_s = F.when(
        F.size(sd) == 0,
        F.when(is5424, F.lit("- ")).otherwise(F.lit(""))
    ).otherwise(F.concat(F.array_join(F.transform(sd, _elem_str), ""),
                         F.lit(" ")))
    return F.concat(head, F.when(is5424, mid_5424).otherwise(mid_3164),
                    sd_s, msg)


def _elem_str(e: Column) -> Column:
    params = F.transform(
        e["params"],
        lambda p: F.concat(F.lit(" "), p["key"], F.lit('="'), p["value"],
                           F.lit('"')))
    return F.concat(F.lit("["), e["id"], F.array_join(params, ""),
                    F.lit("]"))
