"""Arm parsing for the class-scale training harness (scripts/train_hard.py).

The harness turned multi-arm in round 3 (fixed-neg A/B + longer runs merge
into one artifact); these tests pin the spec grammar and the legacy-name
compatibility that lets new invocations resume/extend old work dirs.
"""

import importlib.util
import os

_SPEC = importlib.util.spec_from_file_location(
    "train_hard",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "train_hard.py"),
)
train_hard = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(train_hard)


class TestParseArms:
    def test_defaults_match_legacy_ab(self):
        arms = train_hard.parse_arms("neg_on,neg_off", 10000, 8)
        assert [a["key"] for a in arms] == ["neg_on", "neg_off"]
        # legacy checkpoint dir names must be preserved so a new invocation
        # can resume the historical A/B work dirs
        assert [a["name"] for a in arms] == ["hard_neg_on", "hard_neg_off"]
        assert all(a["steps"] == 10000 and a["lr_drop"] == 8 for a in arms)
        # neg_off disables the cadence by pushing first_neg_step past the run
        assert arms[1]["extra"] == ["--first_neg_step", "100000"]
        assert arms[0]["extra"] == []

    def test_fixed_arm_gets_opt_in_objective(self):
        (arm,) = train_hard.parse_arms("fixed_neg", 5000, 4)
        assert arm["extra"] == ["--fixed_neg_objective", "true"]
        assert arm["name"] == "hard_fixed_neg"

    def test_per_arm_steps_and_lr_drop_override(self):
        arms = train_hard.parse_arms("fixed_neg:10000:8,neg_on_25k:25000:16",
                                     1, 1)
        assert arms[0]["steps"] == 10000 and arms[0]["lr_drop"] == 8
        assert arms[1]["steps"] == 25000 and arms[1]["lr_drop"] == 16
        # suffix on the key still routes to the default-cadence semantics
        assert arms[1]["extra"] == []

    def test_empty_fields_fall_back_to_defaults(self):
        (arm,) = train_hard.parse_arms("neg_on::12", 7000, 3)
        assert arm["steps"] == 7000 and arm["lr_drop"] == 12

    def test_whitespace_and_trailing_commas_tolerated(self):
        arms = train_hard.parse_arms(" neg_on:100 , ", 1, 1)
        assert len(arms) == 1 and arms[0]["steps"] == 100
