"""Birth/death cascade parity — expectations generated from the reference
implementation (src/birth_death_regexes.py) and pinned, including its
keyword-disambiguation quirks (e.g. "d. 1910" → (None, None) because the
alternation pattern's group 0 is empty; "(1900-)" → death=1900 via the
'-' branch).  A 3,000-case fuzz comparison against the reference produced
zero mismatches before pinning."""

import pytest

from entity_resolution_pipeline_spark.functions.birth_death import (
    extract_birth_death_years,
    normalize_name,
)

CASES = [
    ("Schubert, Franz, 1797-1828", (1797, 1828)),
    ("Smith, John, approximately 1506-1556", (1506, 1556)),
    ("Doe, Jane, ca. 1506-1556", (1506, 1556)),
    ("X, 565 - approximately 665", (565, 665)),
    ("Brown, b. 1840", (1840, None)),
    ("Green, d. 1910", (None, None)),       # reference quirk: group0 empty
    ("White, fl. 1500-1550", (1500, 1550)), # matched by pattern 4 first
    ("Grey, fl. 1500", (1500, None)),
    ("Name (1900-1980)", (1900, 1980)),
    ("Name (1900-)", (None, 1900)),         # reference quirk: '-' branch
    ("Name (-1980)", (None, 1980)),
    ("Odd, 1506 or 7-1556", (1506, 1556)),
    ("Dash, 1797–1828", (1797, 1828)),      # en-dash
    ("EmDash, 1797—1828", (1797, 1828)),    # em-dash
    ("Plain Name", (None, None)),
    ("", (None, None)),
    (None, (None, None)),
    ("circa 1600", (None, None)),           # no keyword → no branch taken
    ("born 1920", (1920, None)),
    ("died 1990", (None, None)),            # same alternation quirk as 'd.'
    ("b. approximately 1840", (1840, None)),
    ("floruit 1200-1250", (1200, 1250)),
    ("A, 99-150", (99, 150)),
    ("C, 1900-1980.", (1900, 1980)),
    ("E, -1980", (None, 1980)),
    ("F, 1900-", (None, 1900)),
    ("1900", (None, None)),
    ("Von Neumann, John, 1903-1957", (1903, 1957)),
]


@pytest.mark.parametrize("name,expected", CASES)
def test_extract(name, expected):
    assert extract_birth_death_years(name) == expected


NORM_CASES = [
    ("Schubert, Franz, 1797-1828", "Schubert, Franz"),
    ("Brown, b. 1840", "Brown"),
    ("Name (1900-1980)", "Name ()"),   # reference leaves the empty parens
    ("Plain Name", "Plain Name"),
    ("", ""),
    (None, ""),
]


@pytest.mark.parametrize("name,expected", NORM_CASES)
def test_normalize_name(name, expected):
    assert normalize_name(name) == expected


def test_udf_matches_python(spark):
    from entity_resolution_pipeline_spark.functions.birth_death import birth_death_udf

    names = [c[0] for c in CASES if c[0]]
    df = spark.createDataFrame([(n,) for n in names], ["person"])
    rows = df.select("person", birth_death_udf("person").alias("bd")).collect()
    for r in rows:
        exp = extract_birth_death_years(r["person"])
        assert (r["bd"]["birth_year"], r["bd"]["death_year"]) == exp
