"""SAS label-dictionary parser semantics (S5; reference etl.py:101-125).

Pins every quirk SURVEY.md §2.1/S5 flags: scan-from-first-occurrence
(I94MODE/I94VISA match their comment text first), block-ends-at-semicolon,
silent skip of non-`key = value` lines, strip-whitespace-then-quotes order
(so spaces *inside* quotes survive).
"""

from pathlib import Path

import pytest

from udacity_dend_capstone_immigration_spark.sources.sas_labels import parse_sas_labels

LABELS = (Path(__file__).parent / "fixtures" / "labels.SAS").read_text()


def test_country_block():
    pairs = parse_sas_labels(LABELS, "I94RES")
    assert pairs[0] == ("101", "ALPHALAND")
    assert ("103", "No Country Code (999)") in pairs
    assert ("104", "INVALID: UNKNOWN") in pairs
    assert len(pairs) == 6


def test_strip_order_keeps_spaces_inside_quotes():
    # reference strips whitespace THEN quotes, so 'BETALIA  ' keeps its
    # trailing spaces after quote removal
    pairs = dict(parse_sas_labels(LABELS, "I94RES"))
    assert pairs["102"] == "BETALIA  "


def test_port_block_includes_no_comma_and_two_comma_entries():
    pairs = dict(parse_sas_labels(LABELS, "I94PORT"))
    assert pairs["NYC"] == "NEW YORK, NY"
    assert pairs["XXX"] == "No PORT Code (XXX)"  # no comma → null state later
    assert pairs["ZZZ"] == "SOMEWHERE, FAR, AWAY"  # 2 commas → 2nd part only
    assert len(pairs) == 6


def test_mode_block_scans_from_comment_occurrence():
    # 'I94MODE' first occurs in a comment line; scan must still reach the
    # value block that follows before the terminating ';'
    pairs = parse_sas_labels(LABELS, "I94MODE")
    assert pairs == [("1", "Air"), ("2", "Sea"), ("3", "Land"), ("9", "Not reported")]


def test_state_block():
    pairs = dict(parse_sas_labels(LABELS, "I94ADDR"))
    assert pairs["99"] == "All Other Codes"
    assert len(pairs) == 5


def test_visa_parsed_from_comment_block():
    # I94VISA codes exist ONLY inside a /* comment */ with no ';' until
    # 'run ;' — the parser must still extract the 3 pairs and skip the
    # comment-delimiter lines
    pairs = parse_sas_labels(LABELS, "I94VISA")
    assert pairs == [("1", "Business"), ("2", "Pleasure"), ("3", "Student")]


def test_missing_label_raises():
    with pytest.raises(ValueError):
        parse_sas_labels(LABELS, "NO_SUCH_LABEL")
