"""Retention policy + pruning math + diff protocol (reference test_retention.py role)."""

import math

from whisperlivekit_tpu.session.alignment import TokensAlignment, resolve_retention_seconds
from whisperlivekit_tpu.session.diff import DiffTracker
from whisperlivekit_tpu.timed import ASRToken, FrontData, Segment, State


class Args:
    diarization = False


def tok(start, end, text):
    return ASRToken(start=start, end=end, text=text)


class TestRetentionPolicy:
    def test_explicit_wins(self):
        assert resolve_retention_seconds(120, "full") == 120
        assert resolve_retention_seconds(120, "diff") == 120

    def test_zero_or_negative_is_unlimited(self):
        assert math.isinf(resolve_retention_seconds(0, "diff"))
        assert math.isinf(resolve_retention_seconds(-1, "full"))

    def test_mode_defaults(self):
        # full mode: clients get the whole transcript every update — pruning
        # would permanently delete their earliest lines (reference issue #372)
        assert math.isinf(resolve_retention_seconds(None, "full"))
        assert resolve_retention_seconds(None, "diff") == 300.0


class TestPruning:
    def test_old_tokens_pruned(self):
        ta = TokensAlignment(State(), Args(), sep=" ", retention_seconds=10.0)
        ta.all_tokens = [tok(i, i + 1, f"w{i}") for i in range(0, 100, 5)]
        ta._prune()
        latest = ta.all_tokens[-1].end
        assert all(t.end >= latest - 10.0 for t in ta.all_tokens)

    def test_infinite_retention_keeps_all(self):
        ta = TokensAlignment(State(), Args(), sep=" ", retention_seconds=math.inf)
        ta.all_tokens = [tok(i, i + 1, f"w{i}") for i in range(0, 1000, 50)]
        ta._prune()
        assert len(ta.all_tokens) == 20


class TestDiffProtocol:
    def fd(self, texts, start=0):
        return FrontData(
            status="active_transcription",
            lines=[
                Segment(start=float(start + i), end=float(start + i + 1), text=t, speaker=-1)
                for i, t in enumerate(texts)
            ],
        )

    def test_snapshot_then_diff(self):
        dt = DiffTracker()
        m1 = dt.to_message(self.fd(["hello"]))
        assert m1["type"] == "snapshot" and m1["seq"] == 1
        m2 = dt.to_message(self.fd(["hello", "world"]))
        assert m2["type"] == "diff" and m2["seq"] == 2
        assert [l["text"] for l in m2["new_lines"]] == ["world"]

    def test_changed_line_resent(self):
        dt = DiffTracker()
        dt.to_message(self.fd(["hello", "worl"]))
        m = dt.to_message(self.fd(["hello", "world"]))
        assert [l["text"] for l in m["new_lines"]] == ["world"]
        assert "lines_pruned" not in m

    def test_front_pruning_detected(self):
        dt = DiffTracker()
        dt.to_message(self.fd(["a", "b", "c"]))
        # "a" pruned away; b/c unchanged
        fd2 = FrontData(
            status="active_transcription",
            lines=[
                Segment(start=1.0, end=2.0, text="b", speaker=-1),
                Segment(start=2.0, end=3.0, text="c", speaker=-1),
            ],
        )
        m = dt.to_message(fd2)
        assert m["lines_pruned"] == 1
        assert "new_lines" not in m

    def test_no_change_no_new_lines(self):
        dt = DiffTracker()
        dt.to_message(self.fd(["same"]))
        m = dt.to_message(self.fd(["same"]))
        assert "new_lines" not in m and "lines_pruned" not in m

    def test_reset(self):
        dt = DiffTracker()
        dt.to_message(self.fd(["x"]))
        dt.reset()
        m = dt.to_message(self.fd(["x"]))
        assert m["type"] == "snapshot" and m["seq"] == 1
