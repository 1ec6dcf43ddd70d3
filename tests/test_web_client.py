"""The built-in web client implements BOTH capture paths it claims.

Round-2 verdict: server/web.py's docstring claimed a MediaRecorder
fallback while the client implemented PCM-worklet only and read
``useAudioWorklet`` into a dead variable. These checks pin the contract:
the page honors the server's config message (reference
basic_server.py:127 semantics) and carries a real WebM/Opus path."""

from whisperlivekit_tpu.server.web import render_index


def test_both_capture_paths_present():
    html = render_index()
    assert "AudioWorkletNode" in html           # PCM path
    assert "MediaRecorder" in html              # WebM/Opus fallback
    assert "audio/webm;codecs=opus" in html


def test_config_message_gates_the_choice():
    html = render_index()
    # the client waits for the server's config frame before capturing,
    # and branches on the announced format
    assert "useAudioWorklet" in html
    assert "configResolve" in html
    assert "if (useWorklet)" in html
    assert "recorder.start(" in html


def test_stop_tears_down_recorder():
    html = render_index()
    assert "recorder.stop()" in html
