"""Dataset-card honesty sections (tools/dataset_card.build_card):
the language-ID caveat must render exactly when the stopword heuristic
disagrees with the labeled lang column beyond the threshold."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from dataset_card import LANG_DISAGREE_CAVEAT, build_card  # noqa: E402

SCHEMA = "doc_id LONG, text STRING, lang STRING, source STRING"

# English-looking prose: the stopword heuristic reads it as "en"
_EN = (
    "the quick brown fox jumps over the lazy dog and runs into the field "
    "where it sees a friend of the family on a bright morning walk"
)


def _docs(spark, labels):
    rows = [(i, _EN + f" variant {i}", lab, f"src{i % 2}") for i, lab in enumerate(labels)]
    return spark.createDataFrame(rows, SCHEMA)


def test_caveat_renders_on_high_disagreement(spark):
    # every doc labeled 'de' but reading as English: 100% disagreement
    card = "\n".join(build_card(_docs(spark, ["de"] * 8), "unit-test"))
    assert "Detector agreement with the labeled" in card
    assert "CAVEAT" in card
    assert "Do not use `lang (detected)` for language filtering" in card


def test_caveat_absent_on_agreement(spark):
    # labels match what the detector will say: 0% disagreement
    card = "\n".join(build_card(_docs(spark, ["en"] * 8), "unit-test"))
    assert "Detector agreement with the labeled" in card
    assert "CAVEAT" not in card


def test_threshold_is_the_documented_constant(spark):
    # just under the threshold: 1 of 8 docs mislabeled = 12.5% < 20%
    labels = ["de"] + ["en"] * 7
    card = "\n".join(build_card(_docs(spark, labels), "unit-test"))
    assert LANG_DISAGREE_CAVEAT == 0.2
    assert "CAVEAT" not in card
