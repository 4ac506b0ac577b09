"""vcp-tpu: TPU-native distributed video transcode pipeline.

A from-scratch rebuild of the capabilities of ``jxiaof/video-codec-pipeline``
(reference: /root/reference): producers watch directories and publish
fully-specified encode tasks over Redis Streams; stateless consumers pull
tasks, run an **in-process TPU encoder** (replacing the reference's
``exec ffmpeg`` boundary, cmd/consumer.go:370-394), verify the output, and
ack. Hot per-frame transforms run as JAX/Pallas device code; entropy coding
and container muxing run on host (C++ with a Python fallback).

Layout:
    vcp_tpu.config    -- YAML config + preset table (ref: internal/config/config.go)
    vcp_tpu.logging   -- key=value leveled logger   (ref: internal/logging/logger.go)
    vcp_tpu.queue     -- RESP client, embedded mini-redis, Stream + History
                         (ref: internal/redis/{stream,history}.go)
    vcp_tpu.pipeline  -- producer / consumer / stats / clean orchestration
                         (ref: cmd/{producer,consumer,stats,clean}.go)
    vcp_tpu.codec     -- the new encoder: demux/mux, H.264/H.265, presets->params
    vcp_tpu.ops       -- device kernels (color, scale, transform, motion, deblock)
    vcp_tpu.parallel  -- device-mesh sharding of the encode step
    vcp_tpu.native    -- C++ host components (entropy coding) + ctypes loader
"""

__version__ = "0.1.0"
