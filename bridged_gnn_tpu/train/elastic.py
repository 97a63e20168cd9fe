"""Failure detection / elastic recovery (SURVEY §5.3: absent upstream).

``run_elastic`` wraps a training entry point with bounded retries and
checkpoint-based resume: a transient device failure (preempted TPU, lost
tunnel, OOM) restarts the run from the last periodic checkpoint instead of
from scratch. A heartbeat file records liveness for external watchdogs.
"""

from __future__ import annotations

import json
import os
import time
import traceback
from typing import Any, Callable, Dict, Optional

TRANSIENT_ERRORS = (
    "RESOURCE_EXHAUSTED",
    "UNAVAILABLE",
    "DEADLINE_EXCEEDED",
    "INTERNAL",
    "connection",
    "Unable to initialize backend",
)


def is_transient(exc: BaseException) -> bool:
    msg = f"{type(exc).__name__}: {exc}"
    return any(tok.lower() in msg.lower() for tok in TRANSIENT_ERRORS)


class Heartbeat:
    def __init__(self, path: str):
        self.path = path

    def beat(self, **info) -> None:
        payload = dict(ts=time.time(), pid=os.getpid(), **info)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, self.path)

    def age(self) -> Optional[float]:
        try:
            with open(self.path) as f:
                return time.time() - json.load(f)["ts"]
        except Exception:
            return None


def run_elastic(
    fn: Callable[..., Dict[str, Any]],
    *args,
    max_retries: int = 3,
    retry_delay_s: float = 10.0,
    heartbeat_path: Optional[str] = None,
    retry_all: bool = False,
    **kwargs,
) -> Dict[str, Any]:
    """Run ``fn(*args, **kwargs)`` with retries on transient failures.

    For resumable functions (e.g. ``train_ktgnn`` with ``cfg.ckpt_dir``),
    pass ``kwargs['cfg'].resume = True`` semantics yourself or rely on the
    function reading its checkpoint directory; this wrapper only drives the
    retry loop and heartbeat.
    """
    hb = Heartbeat(heartbeat_path) if heartbeat_path else None
    last_exc: Optional[BaseException] = None
    for attempt in range(max_retries + 1):
        if hb:
            hb.beat(attempt=attempt, status="running")
        try:
            out = fn(*args, **kwargs)
            if hb:
                hb.beat(attempt=attempt, status="done")
            return out
        except KeyboardInterrupt:
            raise
        except BaseException as exc:  # noqa: BLE001
            last_exc = exc
            if hb:
                hb.beat(attempt=attempt, status="failed",
                        error=f"{type(exc).__name__}: {exc}")
            if attempt == max_retries or not (retry_all or is_transient(exc)):
                raise
            traceback.print_exc()
            print(f"[elastic] attempt {attempt + 1} failed; retrying in "
                  f"{retry_delay_s}s")
            time.sleep(retry_delay_s)
    raise last_exc  # pragma: no cover
