"""xprof tracing helper — SURVEY §5.1's jax.profiler integration.

The reference's per-instruction timer profiler (lite/core/profile) has two
TPU-native analogs: the prefix-differencing latency_report (tools/profile.py)
and full hardware traces via jax.profiler/xprof, wrapped here:

    from paddle_lite_tpu.tools.trace import trace
    with trace("/tmp/plt_trace"):
        pred.run(feed)
    # then: xprof --logdir /tmp/plt_trace  (or tensorboard --logdir)
"""

from __future__ import annotations

import contextlib

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)
