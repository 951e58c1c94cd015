"""Deterministic subset date parser standing in for ``dateparser.parse``.

The reference calls dateparser with settings
``DATE_ORDER ∈ {DMY,YMD,MDY}``, ``PREFER_DATES_FROM='past'``,
``PREFER_DAY_OF_MONTH='first'``, ``REQUIRE_PARTS=['month','year']``
(block_identification.py:136-138).  That library isn't available here, so
this module implements the subset of its behavior the pipeline relies on,
deterministically (no locale, no current-time dependence except an explicit
``cur_year`` argument):

- tokenization on whitespace / '-' / '/' / ',' / '.';
- month = English month name or abbreviation (case-insensitive), or a
  numeric 1-12 slot per DATE_ORDER;
- REQUIRE month+year: returns None unless both are found;
- PREFER_DAY_OF_MONTH='first': missing day → 1;
- 2-digit years resolve to 2000+YY — matching the behavior the reference
  observed and then "fixed" by subtracting 1000
  (block_identification.py:169-171: "If it interprets year 64 as 2064");
- returns (year, month, day) or None.
"""

from __future__ import annotations

import re

MONTHS = {
    "jan": 1, "january": 1, "feb": 2, "february": 2, "mar": 3, "march": 3,
    "apr": 4, "april": 4, "may": 5, "jun": 6, "june": 6, "jul": 7,
    "july": 7, "aug": 8, "august": 8, "sep": 9, "sept": 9, "september": 9,
    "oct": 10, "october": 10, "nov": 11, "november": 11, "dec": 12,
    "december": 12,
}

_SPLIT = re.compile(r"[\s\-/,.]+")

_DAYS_IN_MONTH = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _valid_day(day: int, month: int) -> bool:
    return 1 <= day <= _DAYS_IN_MONTH[month - 1]


def parse(text: str, date_order: str) -> tuple[int, int, int] | None:
    """Parse per DATE_ORDER; None when no (month, year) interpretation."""
    raw = [
        t2
        for t in _SPLIT.split(text.strip())
        for t2 in (re.sub(r"^\W+|\W+$", "", t),)  # dateparser-style leniency
        if t2
    ]
    if not raw or len(raw) > 3:
        return None
    month_name: int | None = None
    nums: list[str] = []
    for t in raw:
        if t.lower() in MONTHS:
            if month_name is not None:
                return None  # two month words — ambiguous, refuse
            month_name = MONTHS[t.lower()]
        elif t.isdigit():
            nums.append(t)
        else:
            return None  # stray token — not a pure date string

    def year_of(tok: str) -> int | None:
        if len(tok) == 4 and 1000 <= int(tok) <= 2999:
            return int(tok)
        if len(tok) <= 2:
            return 2000 + int(tok)  # dateparser-observed behavior
        return None

    if month_name is not None:
        if len(nums) == 1:
            y = year_of(nums[0])
            return (y, month_name, 1) if y else None
        if len(nums) == 2:
            # day + year in either position; 4-digit (or the later token)
            # is the year, the other the day
            a, b = nums
            if len(a) == 4 and 1000 <= int(a) <= 2999:
                y, d = int(a), int(b)
            elif len(b) == 4 and 1000 <= int(b) <= 2999:
                y, d = int(b), int(a)
            else:
                y2 = year_of(b)
                if y2 is None:
                    return None
                y, d = y2, int(a)
            return (y, month_name, d) if _valid_day(d, month_name) else None
        return None

    # pure-numeric: need exactly 2 or 3 tokens, assigned per DATE_ORDER
    if len(nums) == 2:
        a, b = nums
        # one of them must be a plausible year (4-digit); the other a month
        if len(a) == 4 and 1000 <= int(a) <= 2999 and 1 <= int(b) <= 12:
            return (int(a), int(b), 1)
        if len(b) == 4 and 1000 <= int(b) <= 2999 and 1 <= int(a) <= 12:
            return (int(b), int(a), 1)
        return None
    if len(nums) == 3:
        order = {"DMY": (2, 1, 0), "YMD": (0, 1, 2), "MDY": (2, 0, 1)}[
            date_order
        ]
        y_tok, m_tok, d_tok = (nums[order[0]], nums[order[1]], nums[order[2]])
        y = year_of(y_tok)
        if y is None:
            return None
        m, d = int(m_tok), int(d_tok)
        if not (1 <= m <= 12) or not _valid_day(d, m):
            return None
        return (y, m, d)
    return None
