"""Date formatting parity — golden values from the reference's
/root/reference/tests/test_dateutils.py:37-52."""

import pytest

from hepcrawl_spark.functions.dates import format_date, format_year


@pytest.mark.parametrize("raw,year,formatted", [
    ("2013-05-09T05:16:48Z", 2013, "2013-05-09"),
    ("1973", 1973, "1973"),
    ("1916 Mar 4", 1916, "1916-03-04"),
    ("2014-2", 2014, "2014-02"),
    ("2012-5-55", 2012, "2012-05"),
    ("2012 Feb", 2012, "2012-02"),
    ("1 May 1992", 1992, "1992-05-01"),
    ("5-2022", 2022, "2022-05-01"),
    ("5-222HH", 0, "5-222HH"),
    (1995, 1995, "1995"),
    ("today", 0, "today"),
    ("1988/05/26", 1988, "1988-05-26"),
])
def test_format_date_and_year(raw, year, formatted):
    assert format_date(raw) == formatted
    assert format_year(raw) == year


def test_pre_1900_dates():
    assert format_date("1765-01-03") == "1765-01-03"
    assert format_year("1765-01-03") == 1765
    assert format_date("3 Jan 1765") == "1765-01-03"
