"""Fault-injection stages for validating the engine's failure story.

A 256-node cluster loses workers routinely (OOM kills, spot
preemption, node drains).  Ray's contract is that an actor-pool
map_batches stage with ``max_restarts``/``max_task_retries`` survives
a worker-process death: the actor restarts, the in-flight batch is
re-dispatched, and the job completes with the same result.  These
stages let tests (and operators rehearsing a production rollout)
inject exactly that failure deterministically.

Mirrors the reference's retry posture for its API client
(/root/reference/api/client.py retries transient failures); here the
failure domain is the worker process itself.
"""

from __future__ import annotations

import os

import pyarrow as pa


class CrashOncePassthrough:
    """Identity actor-pool stage where the FIRST actor to claim the
    marker file hard-kills its own process (``os._exit`` — no Python
    exception, no cleanup: the honest worker-death simulation).  Every
    other call passes batches through unchanged.

    The marker file makes the injection exactly-once across the whole
    pool (O_CREAT|O_EXCL is atomic on POSIX), so the job must recover
    from precisely one worker death.
    """

    def __init__(self, marker: str):
        self.marker = marker

    def __call__(self, batch: pa.Table) -> pa.Table:
        try:
            fd = os.open(self.marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return batch
        os.close(fd)
        os._exit(1)
