"""Fault-injection helpers for retry/restart verification.

These live in the package (not under tests/) because a RETRIED task is
deserialized by a FRESH worker process, which must be able to import
the UDF's module — pytest test modules are not importable from Ray
workers, so crash-injecting UDFs defined there fail their retry with
ModuleNotFoundError instead of exercising it.

The crash is a real process death (``os._exit``), not an exception:
Ray Data retries system failures via lineage, while application
exceptions abort the run by design (``max_errored_blocks=0``).
"""

from __future__ import annotations

import os

import pyarrow as pa


def crash_once_then_identity(flag: str, b: pa.Table) -> pa.Table:
    """Kill the worker process the first time any task runs this (the
    cross-process flag file marks the injection as spent), then behave
    as the identity transform on every retry."""
    if not os.path.exists(flag):
        open(flag, "w").close()
        os._exit(1)
    return b


class CrashOnceActor:
    """Actor-pool variant: the restarted actor re-runs ``__init__``
    (where the engine's stateful stages load models/dictionaries) and
    then the retried batch — the ExtractorActor restart story."""

    def __init__(self, flag: str):
        self.flag = flag

    def __call__(self, b: pa.Table) -> pa.Table:
        return crash_once_then_identity(self.flag, b)
