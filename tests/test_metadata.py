"""Header→metadata projection + openings catalogue tests
(reference parity: game_metadata.ml, openings.ml)."""

import pytest

from chessmate_spark.chess import metadata_of_headers, normalize_date
from chessmate_spark.chess import openings


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("1994.09.11", "1994-09-11"),
        ("1994.9.1", "1994-09-01"),
        ("1994.??.??", "1994-01-01"),
        ("1994.??.15", "1994-01-15"),
        ("????.??.??", None),
        ("  ", None),
        (None, None),
        ("1994", "1994"),  # non-3-part strings pass through trimmed
        ("1994.01.123", "1994-01-01"),  # 3+ digit component -> default
    ],
)
def test_normalize_date(raw, expected):
    assert normalize_date(raw) == expected


def test_metadata_full_headers():
    meta = metadata_of_headers(
        {
            "Event": " Interpolis ",
            "Site": "Tilburg NED",
            "Date": "1994.09.11",
            "Round": "1.1",
            "White": "Seirawan, Y",
            "Black": "Smyslov, V",
            "WhiteElo": "2568",
            "BlackElo": " 2690 ",
            "ECO": "E11",
            "Result": "0-1",
        }
    )
    assert meta.event == "Interpolis"
    assert meta.date == "1994-09-11"
    assert meta.white.name == "Seirawan, Y"
    assert meta.white.rating == 2568
    assert meta.black.rating == 2690
    assert meta.eco_code == "E11"
    # E11 is in E00-E59 -> catalogue canonical name backfills opening_name
    assert meta.opening_name == "1.d4 Nf6 2.c4 e6: Indian systems with ...e6"
    assert meta.opening_slug == "1_d4_nf6_2_c4_e6_indian_systems_with_e6"
    assert meta.result == "0-1"


def test_opening_header_takes_precedence():
    meta = metadata_of_headers({"Opening": "King's Indian Defense", "ECO": "B20"})
    assert meta.opening_name == "King's Indian Defense"
    assert meta.opening_slug == "kings_indian_defense"


def test_missing_opening_and_eco():
    meta = metadata_of_headers({"Event": "X"})
    assert meta.opening_name is None and meta.opening_slug is None
    assert meta.white.name == ""


def test_slugify():
    assert openings.slugify("King's Indian Defense") == "kings_indian_defense"
    assert openings.slugify("Caro-Kann Defense") == "caro_kann_defense"
    assert openings.slugify("  A  B  C ") == "a_b_c"


def test_catalogue_lookups():
    assert openings.canonical_name_of_eco("b20") == "Sicilian Defense"
    assert openings.slug_of_eco("E60") == "kings_indian_defense"
    assert openings.slug_of_eco("E99") == "kings_indian_defense"
    assert openings.canonical_name_of_eco("Z99") is None
    assert len(openings.ALL) == 14


def test_filters_for_text():
    filters = openings.filters_for_text("Find King's Indian games please")
    assert ("opening", "kings_indian_defense") in filters
    assert ("eco_range", "E60-E99") in filters
    # sorted + deduped
    assert filters == sorted(set(filters))
    # Byte-level semantics: non-ASCII chars are dropped by sanitize_phrase
    # BEFORE the grünfeld→gruenfeld mapping, so the mapping never fires —
    # matching the reference's behavior (openings.ml:25-27 applies the
    # replacement after sanitize). Don't "improve" to Unicode folding.
    assert openings.normalize_synonym("Grünfeld Defense") == "grnfeld defense"
    # the catalogue carries explicit ASCII synonyms for Grünfeld instead
    assert ("opening", "grunfeld_defense") in openings.filters_for_text(
        "show me grunfeld games"
    )
