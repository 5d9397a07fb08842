"""Intent-compiler goldens — lifted from the reference's test_query.ml:8-56
expectations (via FIXTURES.md item 6)."""

from chessmate_spark.query import MetadataFilter, Request, analyse, normalize


def test_canonical_kings_indian_question():
    plan = analyse(
        Request(
            text=(
                "Find top 3 King's Indian games where white is rated at least"
                " 2500 and black is 100 points lower"
            )
        )
    )
    assert plan.limit == 3
    assert plan.rating.white_min == 2500
    assert plan.rating.black_min is None
    assert plan.rating.max_rating_delta == 100
    assert MetadataFilter("opening", "kings_indian_defense") in plan.filters
    assert MetadataFilter("eco_range", "E60-E99") in plan.filters
    assert "indian" in plan.keywords


def test_french_defense_draw_endgame():
    plan = analyse(
        Request(text="Show me five games that end in a draw in the French Defense endgame")
    )
    assert plan.limit == 5
    assert MetadataFilter("opening", "french_defense") in plan.filters
    assert MetadataFilter("phase", "endgame") in plan.filters
    assert MetadataFilter("result", "1/2-1/2") in plan.filters


def test_normalize_semantics():
    # internal runs of spaces are preserved (tokenize drops empties downstream)
    assert normalize("King's   Indian!") == "kings   indian"
    assert normalize("King's Indian!") == "kings indian"
    assert normalize("café-style") == "caf  style"  # non-ASCII byte -> space
    assert normalize("A1:b2") == "a1 b2"


def test_defaults_and_clamps():
    plan = analyse(Request(text="sicilian games"))
    assert plan.limit == 50 and plan.offset == 0
    plan = analyse(Request(text="x", limit=9999, offset=-5))
    assert plan.limit == 500 and plan.offset == 0
    plan = analyse(Request(text="x", limit=0))
    assert plan.limit == 1


def test_natural_limit_requires_qualifier():
    # bare number with no qualifier word and not followed by "games" -> default
    assert analyse(Request(text="rated 40 or so sicilian")).limit == 50
    assert analyse(Request(text="show 7 sicilian games")).limit == 7
    assert analyse(Request(text="7 games of the french")).limit == 7
    # >50 numbers never qualify as natural limits
    assert analyse(Request(text="top 100 games")).limit == 50


def test_word_numbers():
    assert analyse(Request(text="show five games")).limit == 5
    assert analyse(Request(text="top twenty games")).limit == 20


def test_rating_min_requires_context():
    plan = analyse(Request(text="white rated at least 2500"))
    assert plan.rating.white_min == 2500
    # no min-context word -> no threshold
    plan = analyse(Request(text="white rated 2500"))
    assert plan.rating.white_min is None


def test_rating_delta_via_lower():
    plan = analyse(Request(text="black is 150 points lower"))
    assert plan.rating.max_rating_delta == 150
    assert plan.rating.black_min is None


def test_black_min_with_over():
    plan = analyse(Request(text="black rated over 2600 games"))
    assert plan.rating.black_min == 2600


def test_max_of_repeated_thresholds():
    plan = analyse(Request(text="white above 2400 and white over 2600"))
    assert plan.rating.white_min == 2600


def test_result_filters():
    assert MetadataFilter("result", "1-0") in analyse(Request(text="games where white wins")).filters
    assert MetadataFilter("result", "0-1") in analyse(Request(text="black victory games")).filters


def test_keywords_ordered_first_seen_deduped():
    plan = analyse(Request(text="Karpov karpov endgame Karpov tactics"))
    assert plan.keywords == ("karpov", "endgame", "tactics")


def test_filters_deduped_and_sorted():
    plan = analyse(Request(text="sacrifice sacrifices tactical tactics draw drawn"))
    fields_values = [(f.field, f.value) for f in plan.filters]
    assert fields_values == sorted(set(fields_values))
