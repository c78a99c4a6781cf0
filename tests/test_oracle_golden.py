"""Golden-corpus tests for the plain-Python oracle parser.

Expected values replicate the reference's end-to-end assertions
(/root/reference/tests/tests.rs, rfc3164.rs, structured_data.rs inline
tests), with the year policy pinned to the reference tests' own resolver
(tests.rs:8-10) and local time pinned to UTC.
"""

from datetime import datetime, timedelta, timezone

import pytest

from syslog_loose_spark.config import ParseConfig
from syslog_loose_spark.oracle import (
    Message,
    ParseFail,
    decompose_pri,
    compose_pri,
    parse_message,
    parse_message_exact,
    serialize_message,
    strip_sd_escapes,
)

UTC = timezone.utc


def ts(y, mo, d, h, mi, s, us=0, offset_min=0):
    return datetime(y, mo, d, h, mi, s, us,
                    tzinfo=timezone(timedelta(minutes=offset_min)))


def test_pri_decompose():
    assert decompose_pri(0) == (0, 0)
    assert decompose_pri(165) == (20, 5)      # local4, notice
    assert decompose_pri(191) == (23, 7)
    assert decompose_pri(199) == (None, 7)    # facility 24 -> None
    assert compose_pri(20, 5) == 165


def test_nginx_3164():
    raw = ('<190>Dec 28 16:49:07 plertrood-thinkpad-x220 nginx: 127.0.0.1 - '
           '- [28/Dec/2019:16:49:07 +0000] "GET / HTTP/1.1" 304 0 "-" '
           '"Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:71.0) '
           'Gecko/20100101 Firefox/71.0"')
    m = parse_message(raw, ParseConfig(variant="rfc3164"))
    assert m.facility == 23 and m.severity == 6        # local7, info
    assert m.timestamp == ts(2019, 12, 28, 16, 49, 7)  # Dec -> prev year
    assert m.hostname == "plertrood-thinkpad-x220"
    assert m.appname == "nginx"
    assert m.procid_pid is None and m.procid_name is None
    assert m.structured_data == []
    assert m.msg.startswith('127.0.0.1 - - [28/Dec/2019')


def test_rsyslog_sd():
    raw = ('<46>Jan  5 15:33:03 plertrood-ThinkPad-X220 rsyslogd:  [origin '
           'software="rsyslogd" swVersion="8.32.0" x-pid="20506" '
           'x-info="http://www.rsyslog.com"] start')
    m = parse_message(raw)
    assert (m.facility, m.severity) == (5, 6)          # syslog, info
    assert m.timestamp == ts(2020, 1, 5, 15, 33, 3)
    assert m.hostname == "plertrood-ThinkPad-X220"
    assert m.appname == "rsyslogd"
    assert m.structured_data == [("origin", [
        ("software", "rsyslogd"), ("swVersion", "8.32.0"),
        ("x-pid", "20506"), ("x-info", "http://www.rsyslog.com")])]
    assert m.msg == "start"


def test_haproxy_no_hostname():
    m = parse_message("<133>Jan 13 16:33:35 haproxy[73411]: Proxy "
                      "sticky-servers started.")
    assert (m.facility, m.severity) == (16, 5)         # local0, notice
    assert m.hostname is None
    assert m.appname == "haproxy"
    assert m.procid_pid == 73411
    assert m.msg == "Proxy sticky-servers started."


def test_5424_plain():
    raw = ("<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 "
           "- BOM'su root' failed for lonvick on /dev/pts/8")
    m = parse_message(raw)
    assert m.protocol == "RFC5424" and m.version == 1
    assert (m.facility, m.severity) == (4, 2)          # auth, crit
    assert m.timestamp == ts(2003, 10, 11, 22, 14, 15, 3000)
    assert m.hostname == "mymachine.example.com"
    assert m.appname == "su"
    assert m.procid_pid is None and m.procid_name is None
    assert m.msgid == "ID47"
    assert m.structured_data == []
    assert m.msg == "BOM'su root' failed for lonvick on /dev/pts/8"


def test_5424_sd_and_multi_sd():
    raw = ('<165>1 2003-10-11T22:14:15.003Z mymachine.example.com evntslog '
           '- ID47 [exampleSDID@32473 iut="3" eventSource= "Application" '
           'eventID="1011"][examplePriority@32473 class="high"] BOMAn '
           'application event log entry...')
    m = parse_message(raw)
    assert m.structured_data == [
        ("exampleSDID@32473", [("iut", "3"), ("eventSource", "Application"),
                               ("eventID", "1011")]),
        ("examplePriority@32473", [("class", "high")]),
    ]
    assert m.msg == "BOMAn application event log entry..."


def test_5424_empty_param_value():
    raw = ('<165>1 2003-10-11T22:14:15.003Z m e - ID47 '
           '[x iut="3" eventSource="" eventID="1011"] hello')
    m = parse_message(raw)
    assert m.structured_data == [("x", [("iut", "3"), ("eventSource", ""),
                                        ("eventID", "1011")])]


def test_3164_invalid_sd_stays_in_msg():
    raw = ('<46>Jan  5 15:33:03 plertrood-ThinkPad-X220 rsyslogd:  '
           '[software="rsyslogd" swVersion="8.32.0" x-pid="20506" '
           'x-info="http://www.rsyslog.com"] start')
    m = parse_message(raw)
    assert m.structured_data == []
    assert m.msg == ('[software="rsyslogd" swVersion="8.32.0" '
                     'x-pid="20506" x-info="http://www.rsyslog.com"] start')


def test_3164_no_tag_two_spaces():
    raw = ('<46>Jan  5 15:33:03 plertrood-ThinkPad-X220  '
           '[software="rsyslogd"] start')
    m = parse_message(raw)
    assert m.hostname == "plertrood-ThinkPad-X220"
    assert m.appname is None
    assert m.msg == '[software="rsyslogd"] start'


def test_utf8():
    m = parse_message("<46>Jan 5 10:01:00 Übergröße außerplanmäßig "
                      "größenordnungsmäßig")
    assert m.hostname == "Übergröße"
    assert m.appname == "außerplanmäßig"
    assert m.msg == "größenordnungsmäßig"


def test_gobbledegook_fallback():
    raw = "complete and utter gobbledegook"
    m = parse_message(raw)
    assert m == Message(protocol="RFC3164", msg=raw) or (
        m.facility is None and m.severity is None and m.timestamp is None
        and m.hostname is None and m.appname is None and m.msg == raw)


def test_fallback_preserves_untrimmed_input():
    raw = "   not syslog at all   "
    m = parse_message(raw)
    assert m.msg == raw                    # lib.rs:92 — original input


def test_syslog_ng_5424():
    raw = ('<13>1 2019-02-13T19:48:34+00:00 74794bfb6795 root 8449 - '
           '[meta sequenceId="1" sysUpTime="37" language="EN"]'
           '[origin ip="192.168.0.1" software="test"] i am foobar')
    m = parse_message(raw)
    assert (m.facility, m.severity) == (1, 5)
    assert m.procid_pid == 8449
    assert [e[0] for e in m.structured_data] == ["meta", "origin"]
    assert m.msg == "i am foobar"


def test_bad_sd_elements_dropped_5424():
    for bad in ("[incorrect x]", "[incorrect x=]"):
        raw = (f'<13>1 2019-02-13T19:48:34+00:00 74794bfb6795 root 8449 - '
               f'{bad} qwerty')
        m = parse_message(raw)
        assert m.structured_data == []
        assert m.msg == "qwerty"


def test_empty_sd_element_kept_5424():
    raw = ('<13>1 2019-02-13T19:48:34+00:00 74794bfb6795 root 8449 - '
           '[empty] qwerty')
    m = parse_message(raw)
    assert m.structured_data == [("empty", [])]
    assert m.msg == "qwerty"
    raw2 = ('<13>1 2019-02-13T19:48:34+00:00 74794bfb6795 root 8449 - '
            '[empty][meta sequenceId="1"] qwerty')
    m2 = parse_message(raw2)
    assert m2.structured_data == [("empty", []),
                                  ("meta", [("sequenceId", "1")])]


def test_whole_input_trimmed():
    raw = ('\n       <13>1 2019-02-13T19:48:34+00:00 74794bfb6795 root 8449 '
           '- [meta sequenceId="1"] i am foobar    \n')
    m = parse_message(raw)
    assert m.msg == "i am foobar"
    assert m.procid_pid == 8449


def test_syslog_ng_3164():
    m = parse_message("<13>Feb 13 20:07:26 74794bfb6795 root[8539]: "
                      "i am foobar")
    assert m.hostname == "74794bfb6795"
    assert m.appname == "root"
    assert m.procid_pid == 8539
    assert m.timestamp == ts(2020, 2, 13, 20, 7, 26)
    assert m.msg == "i am foobar"


def test_omfwd_3339_in_3164():
    raw = ('<190>2019-02-13T21:53:30.605850+00:00 74794bfb6795 '
           'liblogging-stdlog:  [origin software="rsyslogd" '
           'swVersion="8.24.0" x-pid="9043" '
           'x-info="http://www.rsyslog.com"] start')
    m = parse_message(raw)
    assert m.protocol == "RFC3164"
    assert m.timestamp == ts(2019, 2, 13, 21, 53, 30, 605850)
    assert m.appname == "liblogging-stdlog"
    assert [e[0] for e in m.structured_data] == ["origin"]
    assert m.msg == "start"


def test_juniper_appname_with_colons():
    raw = ("<28>1 2020-05-22T14:59:09.250-03:00 OX-XXX-MX204 "
           "OX-XXX-CONTEUDO:rpd 6589 - - bgp_listen_accept: %DAEMON-4: "
           "Connection attempt from unconfigured neighbor: "
           "2001:XXX::219:166+57284")
    m = parse_message(raw)
    assert (m.facility, m.severity) == (3, 4)          # daemon, warning
    assert m.timestamp == ts(2020, 5, 22, 14, 59, 9, 250000, -180)
    assert m.appname == "OX-XXX-CONTEUDO:rpd"
    assert m.procid_pid == 6589
    assert m.msg.startswith("bgp_listen_accept:")


def test_missing_pri():
    m = parse_message("Dec 28 16:49:07 plertrood-thinkpad-x220 nginx: hi")
    assert m.facility is None and m.severity is None
    assert m.hostname == "plertrood-thinkpad-x220"
    m2 = parse_message("1 2020-05-22T14:59:09.250-03:00 OX-XXX-MX204 "
                       "OX-XXX-CONTEUDO:rpd 6589 - - hello")
    assert m2.protocol == "RFC5424"
    assert m2.facility is None and m2.severity is None
    assert m2.hostname == "OX-XXX-MX204"


def test_exact_mode_raises():
    with pytest.raises(ParseFail):
        parse_message_exact("I am an invalid syslog message, but I do like "
                            "cheese")


def test_exact_with_tz():
    cfg = ParseConfig(tz_offset_seconds=5 * 3600)
    m = parse_message_exact("<13>Feb 13 20:07:26 74794bfb6795 root[8539]: "
                            "i am foobar", cfg)
    assert m.timestamp == ts(2020, 2, 13, 20, 7, 26, 0, 300)
    # instant check: 20:07:26+05:00 == 15:07:26Z
    assert m.timestamp.astimezone(UTC) == ts(2020, 2, 13, 15, 7, 26)


def test_feb29_invalid_date_fallback():
    raw = "<134> Feb 29 14:07:19 myhostname sshd - - - this is my message"
    cfg = ParseConfig(year_policy=lambda mon: 2019)
    with pytest.raises(ParseFail):
        parse_message_exact(raw, cfg)
    m = parse_message(raw, cfg)
    assert m.facility is None and m.msg == raw


def test_no_space_after_colon():
    m = parse_message("<13>Feb 13 20:07:26 74794bfb6795 root[8539]:syslog "
                      "message")
    assert m.appname == "root" and m.procid_pid == 8539
    assert m.msg == "syslog message"


def test_ip_hostnames():
    m4 = parse_message("<34>1 2003-10-11T22:14:15.003Z 42.52.1.1 su - ID47 "
                       "- bananas and peas")
    assert m4.hostname == "42.52.1.1"
    m6 = parse_message("<34>1 2003-10-11T22:14:15.003Z "
                       "::FFFF:129.144.52.38 su - ID47 - bananas and peas")
    assert m6.hostname == "::FFFF:129.144.52.38"
    assert m6.msg == "bananas and peas"


def test_ubnt_sd_lookalike_stays_in_msg():
    raw = ("<4>Jan 26 05:59:54 ubnt kernel: [WAN_LOCAL-default-D]IN=eth0 "
           "OUT= MAC=b4 SRC=1.2.3.4")
    m = parse_message(raw)
    assert (m.facility, m.severity) == (0, 4)
    assert m.hostname == "ubnt" and m.appname == "kernel"
    assert m.structured_data == []
    assert m.msg == "[WAN_LOCAL-default-D]IN=eth0 OUT= MAC=b4 SRC=1.2.3.4"


def test_f5_trailing_colon_msgid():
    raw = ('<131>1 2025-05-09T09:56:18.906539+02:00 Host-Name.network.example'
           ' appname 1234 01230456:1: [F5@1234 '
           'hostname="Host-Name.network.example" '
           'errdefs_msgno="01230456:1:"] RST sent from 192.0.2.1:443 to '
           '192.0.2.2:1176, [0xdeadbef:1010] RST from BIG-IP internal '
           'Linux host')
    m = parse_message(raw)
    assert (m.facility, m.severity) == (16, 3)
    assert m.timestamp == ts(2025, 5, 9, 9, 56, 18, 906539, 120)
    assert m.msgid == "01230456:1:"
    assert m.procid_pid == 1234
    assert m.structured_data == [("F5@1234", [
        ("hostname", "Host-Name.network.example"),
        ("errdefs_msgno", "01230456:1:")])]
    assert m.msg.startswith("RST sent from")


def test_null_timestamp_5424():
    m = parse_message("<14>1 - 10.0.4.87 Serial-Debugger - - - "
                      "Serializer started!")
    assert m.timestamp is None
    assert m.hostname == "10.0.4.87"
    assert m.appname == "Serial-Debugger"
    assert m.msg == "Serializer started!"


def test_host_space_3164():
    m = parse_message("<54> 1970-01-01T00:01:31+00:00 host :")
    assert (m.facility, m.severity) == (6, 6)          # lpr, info
    assert m.timestamp == ts(1970, 1, 1, 0, 1, 31)
    assert m.hostname == "host"
    assert m.appname is None
    assert m.msg == ""


def test_bare_header_colon_separator():
    for raw in ("<34>Oct 11 22:14:15 : a message",
                "<34>OCT 11 22:14:15 : a message"):
        m = parse_message(raw)
        assert m.timestamp == ts(2020, 10, 11, 22, 14, 15)
        assert m.hostname is None and m.appname is None
        assert m.msg == "a message"


def test_apache_bracket_run_stays_in_msg():
    raw = ("<131>Jun 8 11:54:08 master apache_error [Tue Jun 08 "
           "11:54:08.929301 2021] [php7:emerg] [pid 1374899] rest of message")
    m = parse_message(raw)
    assert m.hostname == "master" and m.appname == "apache_error"
    assert m.structured_data == []
    assert m.msg == ("[Tue Jun 08 11:54:08.929301 2021] [php7:emerg] "
                     "[pid 1374899] rest of message")


def test_3164_with_year_timestamp():
    m = parse_message("<34>Dec 28 2008 16:49:07 mymachine app[323]: "
                      "a message")
    assert m.timestamp == ts(2008, 12, 28, 16, 49, 7)
    assert m.appname == "app" and m.procid_pid == 323


def test_3164_with_year_tz_quirk():
    # with-year + explicit tz: naive time attached to the offset as if UTC
    # (timestamp.rs:141-146)
    cfg = ParseConfig(tz_offset_seconds=2 * 3600)
    m = parse_message_exact("<34>Dec 28 2008 16:49:07 mymachine app[323]: x",
                            cfg)
    assert m.timestamp.astimezone(UTC) == ts(2008, 12, 28, 16, 49, 7)
    assert m.timestamp.utcoffset() == timedelta(hours=2)
    # no-year + explicit tz: naive interpreted IN the zone
    m2 = parse_message_exact("<34>Dec 28 16:49:07 mymachine app[323]: x", cfg)
    assert m2.timestamp.astimezone(UTC) == ts(2019, 12, 28, 14, 49, 7)


def test_host_dash_tag_resolves_all_none():
    # field2 == '-' (Some(None)) hits the reference's catch-all arm
    # (rfc3164.rs:58-60): host AND tag end up None.
    m = parse_message("<34>Oct 11 22:14:15 myhost -: a message")
    assert m.hostname is None and m.appname is None
    assert m.msg == "a message"


def test_json_msg_after_two_spaces():
    m = parse_message('<134>Oct 30 16:05:54 opsaudit  {"username": "admin", '
                      '"mfa": 0}')
    assert m.hostname == "opsaudit"
    assert m.appname is None
    assert m.msg == '{"username": "admin", "mfa": 0}'


def test_sd_escape_stripping():
    raw = ('<165>1 2003-10-11T22:14:15.003Z m e - ID47 '
           '[id aa="hullo \\"there\\"" bb="let\'s \\\\\\\\do this\\\\\\\\" '
           'cc="hello [bye\\]" dd="hello\\nbye" ee="not \\esc\\aped"] '
           'qwerty')
    m = parse_message(raw)
    params = dict(m.structured_data[0][1])
    # raw values keep the escapes (zero-copy semantics of the reference)
    assert params["aa"] == 'hullo \\"there\\"'
    stripped = {k: strip_sd_escapes(v) for k, v in params.items()}
    assert stripped["aa"] == 'hullo "there"'
    assert stripped["bb"] == "let's \\\\do this\\\\"
    assert stripped["cc"] == "hello [bye]"
    assert stripped["dd"] == "hello\nbye"
    assert stripped["ee"] == "not \\esc\\aped"


def test_pri_out_of_range_facility():
    m = parse_message("<199>1 - host app - - - x")   # facility 24 -> None
    assert m.facility is None and m.severity == 7


def test_pri_overflow_not_consumed():
    # <256> overflows u8 -> PRI not consumed -> nothing else parses -> raw
    raw = "<256>Oct 11 22:14:15 host app: message"
    m = parse_message(raw)
    assert m.facility is None and m.msg == raw


def test_roundtrip_serialize_parse():
    raw = "<34>1 2003-10-11T22:14:15.003Z mymachine.example.com su - ID47 " \
          "- BOM message"
    m = parse_message(raw)
    s = serialize_message(m)
    m2 = parse_message(s)
    assert m.eq_reference(m2)


def test_serialize_blank_msg_roundtrip():
    # tests.rs:360-402 (note reference Message equality ignores protocol,
    # message.rs:90-102)
    m = Message(protocol="RFC5424", version=1, facility=9, severity=3,
                timestamp=ts(1969, 12, 3, 23, 58, 58), msg="")
    s = serialize_message(m)
    m2 = parse_message(s)
    assert m.eq_reference(m2)
