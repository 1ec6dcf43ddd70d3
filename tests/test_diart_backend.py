"""Diart backend with a fake pipeline (diart/pyannote are not installed on
zero-egress hosts; the seam pins block pacing, annotation parsing, replace
semantics, and the silence offset)."""

import asyncio

import numpy as np
import pytest

from whisperlivekit_tpu.diarization.diart import (
    DiartDiarization,
    DiartDiarizationOnline,
    _speaker_index,
)


class FakeSegment:
    def __init__(self, start, end):
        self.start, self.end = start, end


class FakeAnnotation:
    def __init__(self, tracks):
        self._tracks = tracks  # list of (start, end, label)

    def itertracks(self, yield_label=False):
        for start, end, label in self._tracks:
            yield FakeSegment(start, end), None, label


class FakePipeline:
    """Each 0.5 s block: speaker0 first 2 blocks, then relabels history."""

    def __init__(self):
        self.t = 0.0
        self.calls = 0

    def __call__(self, blocks):
        outs = []
        for _ in blocks:
            self.calls += 1
            end = self.t + 0.5
            if self.calls <= 2:
                ann = FakeAnnotation([(self.t, end, "speaker0")])
            else:
                # cumulative relabel: history becomes speaker1
                ann = FakeAnnotation([(0.0, end, "speaker1")])
            outs.append((ann, None))
            self.t = end
        return outs


def test_speaker_label_parsing():
    assert _speaker_index("speaker0") == 0
    assert _speaker_index("SPEAKER_03") == 3
    assert _speaker_index("unknown") == 0


def test_blocks_and_replace_semantics():
    sess = DiartDiarizationOnline(FakePipeline())
    sess.insert_audio_chunk(np.zeros(16000, np.float32))  # 2 blocks
    segs = asyncio.run(sess.diarize())
    assert len(segs) == 2
    assert all(s.speaker == 0 for s in segs)
    assert segs[-1].end == 1.0

    sess.insert_audio_chunk(np.zeros(8000, np.float32))  # 1 more block
    segs = asyncio.run(sess.diarize())
    # history relabeled: the cumulative view replaced overlapping spans
    assert segs[-1].speaker == 1
    assert segs[-1].start == 0.0 and segs[-1].end == 1.5


def test_partial_block_buffers():
    pipe = FakePipeline()
    sess = DiartDiarizationOnline(pipe)
    sess.insert_audio_chunk(np.zeros(4000, np.float32))  # < one block
    segs = asyncio.run(sess.diarize())
    assert segs == [] and pipe.calls == 0
    sess.insert_audio_chunk(np.zeros(4000, np.float32))  # completes the block
    segs = asyncio.run(sess.diarize())
    assert pipe.calls == 1 and len(segs) == 1


def test_silence_offsets_timeline():
    sess = DiartDiarizationOnline(FakePipeline())
    sess.insert_silence(10.0)
    sess.insert_audio_chunk(np.zeros(8000, np.float32))
    segs = asyncio.run(sess.diarize())
    assert segs[0].start == 10.0


def test_holder_uses_injected_factory():
    holder = DiartDiarization(pipeline_factory=FakePipeline)
    s1, s2 = holder.new_session(), holder.new_session()
    assert s1.pipeline is not s2.pipeline  # per-session pipeline state


def test_missing_diart_raises_informative():
    with pytest.raises(ImportError, match="diart"):
        DiartDiarization(config=None)
