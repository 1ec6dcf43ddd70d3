// Capture tab audio (chrome.tabCapture), downsample to 16 kHz s16le PCM in an
// AudioWorklet, stream to the server's /asr WebSocket, render incremental
// results — the extension counterpart of the built-in web UI.
const btn = document.getElementById('go');
const out = document.getElementById('out');
const buf = document.getElementById('buf');
let running = false, ws = null, ctx = null, stream = null;

const worklet = `
class Forwarder extends AudioWorkletProcessor {
  process(inputs) {
    const ch = inputs[0][0];
    if (ch) this.port.postMessage(ch.slice(0));
    return true;
  }
}
registerProcessor('fwd', Forwarder);`;

function f32tos16(f) {
  const o = new Int16Array(f.length);
  for (let i = 0; i < f.length; i++)
    o[i] = Math.max(-32768, Math.min(32767, f[i] * 32768));
  return o.buffer;
}

function render(d) {
  if (!d.lines) return;
  out.innerHTML = d.lines.map(l =>
    l.speaker === -2
      ? `<div class="sil">… silence</div>`
      : `<div>${l.speaker > 1 ? '<b>S' + l.speaker + ':</b> ' : ''}${l.text || ''}</div>`
  ).join('');
  buf.textContent = d.buffer_transcription || '';
}

async function start() {
  stream = await new Promise((res, rej) =>
    chrome.tabCapture.capture({ audio: true, video: false },
      s => s ? res(s) : rej(chrome.runtime.lastError)));
  ws = new WebSocket(document.getElementById('url').value);
  ws.binaryType = 'arraybuffer';
  ws.onmessage = e => render(JSON.parse(e.data));
  await new Promise(r => ws.onopen = r);

  ctx = new AudioContext({ sampleRate: 16000 });
  await ctx.audioWorklet.addModule(
    URL.createObjectURL(new Blob([worklet], { type: 'application/javascript' })));
  const src = ctx.createMediaStreamSource(stream);
  const node = new AudioWorkletNode(ctx, 'fwd');
  node.port.onmessage = e => { if (ws.readyState === 1) ws.send(f32tos16(e.data)); };
  src.connect(node);
  src.connect(ctx.destination);  // keep the tab audible
}

async function stop() {
  if (ws && ws.readyState === 1) ws.send(new ArrayBuffer(0));
  if (ctx) await ctx.close();
  if (stream) stream.getTracks().forEach(t => t.stop());
}

btn.onclick = async () => {
  running = !running;
  btn.textContent = running ? 'Stop' : 'Transcribe this tab';
  btn.classList.toggle('on', running);
  try { running ? await start() : await stop(); }
  catch (e) { out.textContent = 'error: ' + e; running = false; }
};
