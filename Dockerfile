# WhisperLiveKit-TPU server image (Cloud TPU VM host).
# On GKE/TPU-VM the libtpu runtime comes from the host/base image; this
# image layers the framework + assets on top.
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        ffmpeg g++ && \
    rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY whisperlivekit_tpu ./whisperlivekit_tpu
COPY scripts ./scripts

# jax[tpu] resolves libtpu on TPU hosts; CPU fallback works everywhere.
RUN pip install --no-cache-dir -e . "jax[tpu]" \
        -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        torch --index-url https://download.pytorch.org/whl/cpu && \
    pip install --no-cache-dir transformers safetensors scipy orbax-checkpoint optax

# public assets (tokenizer BPE ranks, silero VAD weights)
ENV WLK_TPU_ASSET_DIR=/app/assets
RUN python scripts/fetch_assets.py || true

EXPOSE 8000
ENTRYPOINT ["wlk", "serve", "--host", "0.0.0.0"]
CMD ["--model-size", "base"]
