"""Birth/death life-date extraction from person-name strings.

Faithful re-implementation of the reference's ordered 15-pattern regex
cascade (src/birth_death_regexes.py:13-147): first pattern that matches wins;
two-group matches with both groups present give (birth, death); one-group
matches are disambiguated by keyword checks **in the reference's exact order**
(born/b. → birth; died/d./'-' → death; fl./floruit → birth), including its
quirks (e.g. "d. 1910" matches the alternation pattern with groups
(None, '1910') and then cleans group 0 → (None, None); "(1900-)" hits the
dash-containing branch → death=1900).  Those quirks are load-bearing for the
pairwise-F1 parity criterion, so they are preserved and pinned by tests.

The cascade is order-sensitive, so it runs in a vectorized Arrow pandas UDF
(pre-compiled patterns, C regex engine per batch) rather than a chain of
`regexp_extract`s, per SURVEY.md §2.2 P5.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

# A year token: 2-4 digits, optionally "?" or "or N" (reference patterns, all
# lines of birth_death_regexes.py:28-70 use this sub-expression).
_Y = r"(\d{2,4}(?:\?|\s+or\s+\d{1,4})?)"
_APPROX = r"(?:approximately|ca\.|circa)"
_DASH = r"[-–—]"

# (regex, n_groups) in the reference's priority order.
_PATTERN_SPECS: tuple[str, ...] = (
    # 1: birth - approximately death      "565 - approximately 665"
    rf"{_Y}\s*{_DASH}\s*{_APPROX}\s+{_Y}",
    # 2: approx birth - approx death
    rf"{_APPROX}\s+{_Y}\s*{_DASH}\s*{_APPROX}\s+{_Y}",
    # 3: approx birth - death             "approximately 1506-1556"
    rf"{_APPROX}\s+{_Y}\s*{_DASH}\s*{_Y}",
    # 4: standard range                   "1797-1828"
    rf"{_Y}\s*{_DASH}\s*{_Y}",
    # 5: dash + approx death only
    rf"{_DASH}\s*{_APPROX}\s+{_Y}",
    # 6: dash + death only                "-1980"
    rf"{_DASH}\s*{_Y}",
    # 7: approx birth + dash
    rf"{_APPROX}\s+{_Y}\s*{_DASH}",
    # 8: birth + dash                     "1900-"
    rf"{_Y}\s*{_DASH}",
    # 9: explicit b./born | d./died prefixes (two-group alternation)
    rf"(?:b\.|born)\s+(?:{_APPROX}\s+)?{_Y}|(?:d\.|died)\s+(?:{_APPROX}\s+)?{_Y}",
    # 10: lone approximate year
    rf"{_APPROX}\s+{_Y}",
    # 11: "(1900-1980)"
    rf"\(\s*{_Y}\s*{_DASH}\s*{_Y}\s*\)",
    # 12: "(1900-)"
    rf"\(\s*{_Y}\s*{_DASH}\s*\)",
    # 13: "(-1980)"
    rf"\(\s*{_DASH}\s*{_Y}\s*\)",
    # 14: "fl. 1500-1550"
    rf"(?:fl\.|floruit)\s+{_Y}\s*{_DASH}\s*{_Y}",
    # 15: "fl. 1500"
    rf"(?:fl\.|floruit)\s+{_Y}",
)

PATTERNS: tuple[re.Pattern[str], ...] = tuple(re.compile(p) for p in _PATTERN_SPECS)

_DIGITS = re.compile(r"\d+")
_PAREN_YEARS = re.compile(rf"\(\s*\d{{2,4}}\s*{_DASH}?\s*\d{{0,4}}\s*\)")
_TRAILING_COMMA = re.compile(r",\s*$")
_WS = re.compile(r"\s+")


def clean_year(year_str: str | None) -> int | None:
    """First digit-group of the token as int (reference
    birth_death_regexes.py:121-147; the range sanity-check is commented out
    there, so any positive digit group passes)."""
    if not year_str:
        return None
    digits = _DIGITS.findall(year_str)
    if not digits:
        return None
    year = int(digits[0])
    return year if year else None


def extract_birth_death_years(name_string: str | None) -> tuple[int | None, int | None]:
    """First-match-wins cascade + keyword disambiguation
    (reference birth_death_regexes.py:77-119, replicated branch-for-branch)."""
    if not name_string:
        return None, None
    for pattern in PATTERNS:
        match = pattern.search(name_string)
        if not match:
            continue
        groups = match.groups()
        birth_year = None
        death_year = None
        if len(groups) >= 2 and groups[0] and groups[1]:
            birth_year = clean_year(groups[0])
            death_year = clean_year(groups[1])
        elif len(groups) >= 1:
            lowered = name_string.lower()
            if "born" in lowered or "b." in lowered:
                birth_year = clean_year(groups[0])
            elif "died" in lowered or "d." in lowered or "-" in name_string:
                death_year = clean_year(groups[0])
            elif "fl." in lowered or "floruit" in lowered:
                birth_year = clean_year(groups[0])
        return birth_year, death_year
    return None, None


def normalize_name(name_string: str | None) -> str:
    """Strip year patterns, trailing commas, collapse whitespace
    (reference birth_death_regexes.py:197-225)."""
    if not name_string:
        return ""
    normalized = name_string
    for pattern in PATTERNS:
        normalized = pattern.sub("", normalized)
    normalized = _PAREN_YEARS.sub("", normalized)
    normalized = _TRAILING_COMMA.sub("", normalized.strip())
    return _WS.sub(" ", normalized).strip()


_BD_SCHEMA = StructType(
    [
        StructField("birth_year", IntegerType(), True),
        StructField("death_year", IntegerType(), True),
    ]
)


@pandas_udf(_BD_SCHEMA)
def birth_death_udf(names: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized extraction → struct(birth_year, death_year)."""
    out = names.map(lambda n: extract_birth_death_years(n) if n else (None, None))
    return pd.DataFrame(
        {
            "birth_year": out.map(lambda t: t[0]).astype("Int32"),
            "death_year": out.map(lambda t: t[1]).astype("Int32"),
        }
    )


@pandas_udf(StringType())
def normalize_name_udf(names: pd.Series) -> pd.Series:
    """Arrow-vectorized name normalization (years stripped)."""
    return names.map(normalize_name)
