"""TestState accessors + AudioPlayer timeline math (pure logic)."""

import pytest

from whisperlivekit_tpu.harness.harness import TestState, _parse_time
from whisperlivekit_tpu.timed import FrontData, Segment, SilentSegment


def fd(lines, buffer=""):
    return FrontData(status="active_transcription", lines=lines, buffer_transcription=buffer)


def seg(start, end, text, speaker=-1):
    return Segment(start=start, end=end, text=text, speaker=speaker)


class TestTestState:
    def make(self):
        lines = [
            seg(0.0, 2.0, " hello there."),
            SilentSegment(start=2.0, end=8.0),
            seg(8.0, 10.0, " welcome back.", speaker=2),
        ]
        return TestState.from_front_data(fd(lines, buffer="unstable tail"), audio_position=10.0)

    def test_text_combines_lines_and_buffer(self):
        st = self.make()
        assert "hello there." in st.committed_text
        assert st.text.endswith("unstable tail")

    def test_silence_accessors(self):
        st = self.make()
        assert st.has_silence
        assert st.silence_at(5.0)
        assert not st.silence_at(1.0)
        assert len(st.silence_segments) == 1

    def test_time_queries(self):
        st = self.make()
        assert st.text_at(1.0) == " hello there."
        assert st.text_at(9.0) == " welcome back."
        assert st.text_between(0, 3) == "hello there."

    def test_timing_invariants(self):
        st = self.make()
        assert st.timing_valid
        assert st.timing_monotonic
        assert st.timing_errors == []

    def test_wer(self):
        st = self.make()
        assert st.wer("hello there welcome back unstable tail") == 0.0
        assert st.wer("completely different words") > 0.5

    def test_speakers(self):
        st = self.make()
        assert st.n_speakers == 2  # unattributed renders as 1, diarized as 2
        assert st.speaker_at(9.0) == 2

    def test_broken_timing_detected(self):
        st = TestState.from_front_data(fd([seg(5.0, 3.0, "bad")]))
        assert not st.timing_valid
        assert st.timing_errors


def test_parse_time():
    assert _parse_time("0:00:01.50") == pytest.approx(1.5)
    assert _parse_time("1:02:03.25") == pytest.approx(3723.25)
