"""Time-filter expression parsing — exact parity with the reference's
query/common/time_filter_test.go "Works" table (now = 2016-03-15 21:24:26
America/Los_Angeles, parsed in America/New_York; covers calendar units,
N-units-ago, signed offsets, absolute year/quarter/month/date/hour/minute
forms, raw unix timestamps, and the US daylight-saving boundaries)."""

import datetime as _dt
import zoneinfo

import pytest

from aresdb_tpu.query.time_util import parse_time_filter_expression

NY = zoneinfo.ZoneInfo("America/New_York")
NOW = _dt.datetime.fromtimestamp(1458102266, NY)  # 2016-03-16T00:24:26-04:00

# (expression, expectedFrom RFC3339, expectedTo, unit) —
# time_filter_test.go:43-106 verbatim
CASES = [
    ("now", "2016-03-16T00:24:26-04:00", "2016-03-16T00:24:26-04:00", "s"),
    ("this year", "2016-01-01T00:00:00-05:00", "2017-01-01T00:00:00-05:00", "y"),
    ("0y", "2016-01-01T00:00:00-05:00", "2017-01-01T00:00:00-05:00", "y"),
    ("this quarter", "2016-01-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00", "q"),
    ("0q", "2016-01-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00", "q"),
    ("this month", "2016-03-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00", "M"),
    ("0M", "2016-03-01T00:00:00-05:00", "2016-04-01T00:00:00-04:00", "M"),
    ("this week", "2016-03-14T00:00:00-04:00", "2016-03-21T00:00:00-04:00", "w"),
    ("0w", "2016-03-14T00:00:00-04:00", "2016-03-21T00:00:00-04:00", "w"),
    ("this day", "2016-03-16T00:00:00-04:00", "2016-03-17T00:00:00-04:00", "d"),
    ("0d", "2016-03-16T00:00:00-04:00", "2016-03-17T00:00:00-04:00", "d"),
    ("today", "2016-03-16T00:00:00-04:00", "2016-03-17T00:00:00-04:00", "d"),
    ("this hour", "2016-03-16T00:00:00-04:00", "2016-03-16T01:00:00-04:00", "h"),
    ("0h", "2016-03-16T00:00:00-04:00", "2016-03-16T01:00:00-04:00", "h"),
    ("this quarter-hour", "2016-03-16T00:15:00-04:00", "2016-03-16T00:30:00-04:00", "15m"),
    ("this minute", "2016-03-16T00:24:00-04:00", "2016-03-16T00:25:00-04:00", "m"),
    ("0m", "2016-03-16T00:24:00-04:00", "2016-03-16T00:25:00-04:00", "m"),
    ("last year", "2015-01-01T00:00:00-05:00", "2016-01-01T00:00:00-05:00", "y"),
    ("-1y", "2015-01-01T00:00:00-05:00", "2016-01-01T00:00:00-05:00", "y"),
    ("last quarter", "2015-10-01T00:00:00-04:00", "2016-01-01T00:00:00-05:00", "q"),
    ("-1q", "2015-10-01T00:00:00-04:00", "2016-01-01T00:00:00-05:00", "q"),
    ("last month", "2016-02-01T00:00:00-05:00", "2016-03-01T00:00:00-05:00", "M"),
    ("-1M", "2016-02-01T00:00:00-05:00", "2016-03-01T00:00:00-05:00", "M"),
    ("last week", "2016-03-07T00:00:00-05:00", "2016-03-14T00:00:00-04:00", "w"),
    ("-1w", "2016-03-07T00:00:00-05:00", "2016-03-14T00:00:00-04:00", "w"),
    ("last day", "2016-03-15T00:00:00-04:00", "2016-03-16T00:00:00-04:00", "d"),
    ("-1d", "2016-03-15T00:00:00-04:00", "2016-03-16T00:00:00-04:00", "d"),
    ("yesterday", "2016-03-15T00:00:00-04:00", "2016-03-16T00:00:00-04:00", "d"),
    ("last hour", "2016-03-15T23:00:00-04:00", "2016-03-16T00:00:00-04:00", "h"),
    ("-1h", "2016-03-15T23:00:00-04:00", "2016-03-16T00:00:00-04:00", "h"),
    ("last quarter-hour", "2016-03-16T00:00:00-04:00", "2016-03-16T00:15:00-04:00", "15m"),
    ("last minute", "2016-03-16T00:23:00-04:00", "2016-03-16T00:24:00-04:00", "m"),
    ("-1m", "2016-03-16T00:23:00-04:00", "2016-03-16T00:24:00-04:00", "m"),
    ("2 years ago", "2014-01-01T00:00:00-05:00", "2015-01-01T00:00:00-05:00", "y"),
    ("-2y", "2014-01-01T00:00:00-05:00", "2015-01-01T00:00:00-05:00", "y"),
    ("3 quarters ago", "2015-04-01T00:00:00-04:00", "2015-07-01T00:00:00-04:00", "q"),
    ("-3q", "2015-04-01T00:00:00-04:00", "2015-07-01T00:00:00-04:00", "q"),
    ("4 months ago", "2015-11-01T00:00:00-04:00", "2015-12-01T00:00:00-05:00", "M"),
    ("-4M", "2015-11-01T00:00:00-04:00", "2015-12-01T00:00:00-05:00", "M"),
    ("5 weeks ago", "2016-02-08T00:00:00-05:00", "2016-02-15T00:00:00-05:00", "w"),
    ("-5w", "2016-02-08T00:00:00-05:00", "2016-02-15T00:00:00-05:00", "w"),
    ("6 days ago", "2016-03-10T00:00:00-05:00", "2016-03-11T00:00:00-05:00", "d"),
    ("-6d", "2016-03-10T00:00:00-05:00", "2016-03-11T00:00:00-05:00", "d"),
    ("70 hours ago", "2016-03-13T01:00:00-05:00", "2016-03-13T03:00:00-04:00", "h"),
    ("-70h", "2016-03-13T01:00:00-05:00", "2016-03-13T03:00:00-04:00", "h"),
    ("5 quarter-hours ago", "2016-03-15T23:00:00-04:00", "2016-03-15T23:15:00-04:00", "15m"),
    ("60 minutes ago", "2016-03-15T23:24:00-04:00", "2016-03-15T23:25:00-04:00", "m"),
    ("-60m", "2016-03-15T23:24:00-04:00", "2016-03-15T23:25:00-04:00", "m"),
    ("2014", "2014-01-01T00:00:00-05:00", "2015-01-01T00:00:00-05:00", "y"),
    ("2014-Q2", "2014-04-01T00:00:00-04:00", "2014-07-01T00:00:00-04:00", "q"),
    ("2014-03", "2014-03-01T00:00:00-05:00", "2014-04-01T00:00:00-04:00", "M"),
    ("2016-03-13", "2016-03-13T00:00:00-05:00", "2016-03-14T00:00:00-04:00", "d"),
    ("2016-03-13 01", "2016-03-13T01:00:00-05:00", "2016-03-13T03:00:00-04:00", "h"),
    ("2016-03-13 02", "2016-03-13T02:00:00-04:00", "2016-03-13T03:00:00-04:00", "h"),
    ("2016-03-13 01:31", "2016-03-13T01:31:00-05:00", "2016-03-13T01:32:00-05:00", "m"),
    ("2015-11-01 01", "2015-11-01T01:00:00-04:00", "2015-11-01T02:00:00-04:00", "h"),
    ("2015-11-01 02", "2015-11-01T02:00:00-05:00", "2015-11-01T03:00:00-05:00", "h"),
    ("2015-11-01 01:31", "2015-11-01T01:31:00-04:00", "2015-11-01T01:32:00-04:00", "m"),
    ("1464832800", "2016-06-01T22:00:00-04:00", "2016-06-01T22:00:00-04:00", "m"),
    ("1464832801", "2016-06-01T22:00:01-04:00", "2016-06-01T22:00:01-04:00", "s"),
]


def _rfc(s):
    return int(_dt.datetime.fromisoformat(s).timestamp())


@pytest.mark.parametrize("expression,efrom,eto,eunit", CASES,
                         ids=[c[0] for c in CASES])
def test_time_filter_expression_parity(expression, efrom, eto, eunit):
    s, e, unit = parse_time_filter_expression(expression, NOW)
    assert int(s.timestamp()) == _rfc(efrom), (expression, s)
    assert int(e.timestamp()) == _rfc(eto), (expression, e)
    assert unit == eunit, expression


def test_fixed_timezone_parity():
    """time_filter_test.go 'Works on fixed timezone': -07:30 fixed zone,
    'this year' from = 1451633400; missing 'to' defaults to now."""
    from aresdb_tpu.query.time_util import parse_time_filter

    tz = _dt.timezone(-_dt.timedelta(hours=7, minutes=30))
    f, t = parse_time_filter("this year", "", tz, 1458102266)
    assert f.ts == 1451633400
    assert t.ts == 1458102266
    f, t = parse_time_filter("", "last year", tz, 1458102266)
    assert t.ts == 1451633400


def test_sao_paulo_midnight_dst():
    """time_filter_test.go 'Corrects America/Sao_Paulo daylight saving
    start issue': DST starts AT midnight, so 'this day' starts at 01:00
    on the 16th and ends at 00:00 on the 17th (adjustMidnight)."""
    from aresdb_tpu.query.time_util import apply_time_offset

    sp = zoneinfo.ZoneInfo("America/Sao_Paulo")
    base = _dt.datetime(2016, 10, 16, 13, 23, tzinfo=sp)
    start, end = apply_time_offset(base, 0, "d")
    assert (start.day, start.hour) == (16, 1)
    assert (end.day, end.hour) == (17, 0)


def test_invalid_expressions_rejected():
    """time_filter_test.go 'Fails on error'."""
    from aresdb_tpu.query.time_util import (TimeError,
                                            parse_time_filter_expression)

    for expression in ("future", "this", "last friday night"):
        with pytest.raises(TimeError):
            parse_time_filter_expression(expression, NOW)
