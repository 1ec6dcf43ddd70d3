"""AlignAtt MT sidecar client against an in-process fake sidecar.

Role of reference tests/test_translation_alignatt.py:27-107: a websockets
server speaking the sidecar protocol, pinning commit monotonicity, latency
presets, pacing, reconnect-resume via accepted_target_prefix, and graceful
degradation while the sidecar is down.
"""

import asyncio
import json
from types import SimpleNamespace

import pytest

websockets = pytest.importorskip("websockets")

from whisperlivekit_tpu.timed import ASRToken, HypothesisTail
from whisperlivekit_tpu.translation.alignatt_client import (
    LATENCY_PRESETS,
    AlignAttTranslationClient,
)


class FakeSidecar:
    """Translates word-by-word: target = 'T(<w>)' per committed source word,
    continuing from the handshake's accepted_target_prefix."""

    def __init__(self):
        self.server = None
        self.port = None
        self.handshakes = []
        self.updates = []
        self.drop_next = 0  # close this many connections mid-update

    async def _handler(self, ws):
        committed_src = []
        prefix = ""
        async for raw in ws:
            msg = json.loads(raw)
            if msg["type"] == "start":
                self.handshakes.append(msg)
                prefix = msg["accepted_target_prefix"]
                committed_src = [w["text"] for w in msg["committed_words"]]
                # resume: translate history words the prefix doesn't cover yet
                already = prefix.count("T(")
                prefix += "".join(f" T({w.strip()})" for w in committed_src[already:])
                continue
            self.updates.append(msg)
            if self.drop_next > 0:
                self.drop_next -= 1
                await ws.close()
                return
            committed_src += [w["text"] for w in msg["committed_words"]]
            # deterministic: target = prefix + one T(w) per NEW word
            new = "".join(f" T({w.strip()})" for w in [x["text"] for x in msg["committed_words"]])
            prefix = prefix + new
            draft = f" d({msg['hypothesis_tail'].strip()})" if msg["hypothesis_tail"] else ""
            await ws.send(json.dumps({"committed_target": prefix, "draft": draft}))

    async def start(self):
        self.server = await websockets.serve(self._handler, "127.0.0.1", 0)
        self.port = self.server.sockets[0].getsockname()[1]
        return f"ws://127.0.0.1:{self.port}"

    async def stop(self):
        self.server.close()
        await self.server.wait_closed()


def make_client(url, latency="balanced"):
    cfg = SimpleNamespace(alignatt_url=url, alignatt_latency=latency, alignatt_context="")
    c = AlignAttTranslationClient(cfg, "en", "fr")
    c._min_interval = 0.0  # tests drive pacing explicitly
    return c


def tok(i, text, punct=False):
    return ASRToken(start=float(i), end=float(i + 1), text=f" {text}" + ("." if punct else ""))


def run(coro):
    return asyncio.run(coro)


def test_translate_and_commit_monotonic():
    async def main():
        side = FakeSidecar()
        url = await side.start()
        c = make_client(url)
        targets = []
        for i in range(3):
            c.insert_tokens([tok(i, f"w{i}")])
            c.insert_tokens(HypothesisTail(text=f"h{i}"))
            _, buf = await c.process_async()
            targets.append(buf.text)
            c._last_call_at = 0.0  # defeat pacing between iterations
        await side.stop()
        return targets, side

    targets, side = run(main())
    assert targets[0].startswith(" T(w0)")
    # append-only growth
    for a, b in zip(targets, targets[1:]):
        committed_a = a.split(" d(")[0]
        assert b.startswith(committed_a)
    # the unstable tail rides as draft, never committed
    assert "d(h2)" in targets[-1]
    assert "d(" not in targets[-1].split(" d(")[0]


def test_reconnect_resumes_with_prefix():
    async def main():
        side = FakeSidecar()
        url = await side.start()
        c = make_client(url)
        c.insert_tokens([tok(0, "alpha")])
        _, _ = await c.process_async()
        assert c.accepted_target_prefix == " T(alpha)"

        side.drop_next = 1  # kill the connection on the next update
        c._last_call_at = 0.0
        c.insert_tokens([tok(1, "beta")])
        _, buf = await c.process_async()  # fails -> backoff, state kept
        assert c.accepted_target_prefix == " T(alpha)"
        assert buf.text == " T(alpha)"  # graceful degradation: last good text

        c._down_until = 0.0  # let it retry now
        c._last_call_at = 0.0
        _, buf = await c.process_async()
        await side.stop()
        return c, side, buf

    c, side, buf = run(main())
    # the reconnect handshake carried the resume state + full history
    resume = side.handshakes[-1]
    assert resume["accepted_target_prefix"] == " T(alpha)"
    assert [w["text"] for w in resume["committed_words"]] == [" alpha", " beta"]
    assert c.accepted_target_prefix.startswith(" T(alpha)")
    assert "T(beta)" in c.accepted_target_prefix


def test_latency_preset_rides_handshake():
    async def main():
        side = FakeSidecar()
        url = await side.start()
        c = make_client(url, latency="low")
        c.insert_tokens([tok(0, "x")])
        await c.process_async()
        await side.stop()
        return side

    side = run(main())
    assert side.handshakes[0]["preset"] == LATENCY_PRESETS["low"]


def test_pacing_skips_calls():
    async def main():
        side = FakeSidecar()
        url = await side.start()
        c = make_client(url)
        c._min_interval = 10.0
        c.insert_tokens([tok(0, "a")])
        await c.process_async()  # first call passes (last_call_at=0)
        n_after_first = len(side.updates)
        c.insert_tokens([tok(1, "b")])
        await c.process_async()  # paced out: no new update message
        await side.stop()
        return n_after_first, len(side.updates)

    first, second = run(main())
    assert first == 1 and second == 1


def test_punctuation_final():
    async def main():
        side = FakeSidecar()
        url = await side.start()
        c = make_client(url)
        c.insert_tokens([tok(0, "done", punct=True)])
        final, buf = await c.process_async()
        await side.stop()
        return final

    final = run(main())
    assert final is not None and "T(done.)" in final.text
    # after a final the source/target state resets (segment boundary)


def test_backoff_grows_while_down():
    async def main():
        c = make_client("ws://127.0.0.1:1")  # nothing listening
        c.insert_tokens([tok(0, "a")])
        await c.process_async()
        b1 = c._backoff
        c._down_until = 0.0
        c._last_call_at = 0.0
        await c.process_async()
        return b1, c._backoff

    b1, b2 = run(main())
    assert b2 > b1 >= 2.0 or (b1 == 2.0 and b2 == 4.0)
