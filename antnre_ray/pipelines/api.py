"""B30 — the user-extension surface: declarative Pipeline of Steps.

Mirrors the reference's "swap a module" extension style (upstream model
modules are the plugin points, UNVERIFIED — SURVEY.md §0) as data:
a ``Pipeline`` is an ordered list of ``Step``s, each naming either a
batch function (``pa.Table -> pa.Table``) or a callable actor class
(stateful; constructed once per actor), compiled onto any
``ray.data.Dataset``. Users extend the engine by inserting/replacing
steps — no engine code changes.

    pipe = Pipeline([
        Step("validate", validate_batch, fn_kwargs={"partitions": 8}),
        Step("assemble", assemble_batch),
        Step("sentencize", sentencize_batch),
        Step("extract", ExtractorActor, batch_size=512,
             concurrency=(1, 8), fn_constructor_kwargs={"seed": 42}),
    ])
    triples = pipe(ds)           # Dataset → Dataset (lazy)
    table = pipe.run_local(tbl)  # the same steps, no Ray (tests/goldens)

Every step runs ``batch_format="pyarrow"`` with zero-copy batches — the
engine-wide contract a custom step must honor.
"""

from __future__ import annotations

import inspect
from dataclasses import dataclass, field
from typing import Any, Callable

import pyarrow as pa

import ray.data


@dataclass
class Step:
    """One pipeline stage.

    ``fn`` is a batch function for stateless steps or a class for
    stateful (actor-pool) steps. Actor steps should pass ``concurrency``
    (``(min, max)`` — a fixed int larger than the session deadlocks) and
    optionally ``batch_size`` / ``num_cpus`` / ``num_gpus``.
    """

    name: str
    fn: Callable
    batch_size: int | None = None
    concurrency: int | tuple[int, int] | None = None
    num_cpus: float | None = None
    num_gpus: float | None = None
    fn_kwargs: dict[str, Any] = field(default_factory=dict)
    fn_constructor_kwargs: dict[str, Any] = field(default_factory=dict)

    @property
    def is_actor(self) -> bool:
        return inspect.isclass(self.fn)

    def apply(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        kwargs: dict[str, Any] = {
            "batch_format": "pyarrow",
            "zero_copy_batch": True,
        }
        if self.batch_size is not None:
            kwargs["batch_size"] = self.batch_size
        if self.num_cpus is not None:
            kwargs["num_cpus"] = self.num_cpus
        if self.num_gpus is not None:
            kwargs["num_gpus"] = self.num_gpus
        # map_batches supports every combination: actors take
        # fn_constructor_kwargs AND per-call fn_kwargs; stateless fns can
        # carry a concurrency cap. Forward whatever the user configured
        # rather than silently dropping it.
        if self.is_actor:
            kwargs["concurrency"] = self.concurrency or (1, 4)
            if self.fn_constructor_kwargs:
                kwargs["fn_constructor_kwargs"] = self.fn_constructor_kwargs
        elif self.concurrency is not None:
            kwargs["concurrency"] = self.concurrency
        if self.fn_kwargs:
            kwargs["fn_kwargs"] = self.fn_kwargs
        return ds.map_batches(self.fn, **kwargs)

    def apply_local(self, batch: pa.Table) -> pa.Table:
        if self.is_actor:
            inst = self.fn(**self.fn_constructor_kwargs)
            return inst(batch, **self.fn_kwargs)
        return self.fn(batch, **self.fn_kwargs)


@dataclass
class Pipeline:
    steps: list[Step]

    def __call__(self, ds: ray.data.Dataset) -> ray.data.Dataset:
        for step in self.steps:
            ds = step.apply(ds)
        return ds

    def run_local(self, batch: pa.Table) -> pa.Table:
        """No-Ray twin: the same steps applied to one Arrow table."""
        for step in self.steps:
            batch = step.apply_local(batch)
        return batch

    def replaced(self, name: str, step: Step) -> "Pipeline":
        """A copy with the named step swapped — the extension point."""
        idx = [i for i, s in enumerate(self.steps) if s.name == name]
        if not idx:
            raise KeyError(f"no step named {name!r}")
        out = list(self.steps)
        out[idx[0]] = step
        return Pipeline(out)

    def inserted_after(self, name: str, step: Step) -> "Pipeline":
        idx = [i for i, s in enumerate(self.steps) if s.name == name]
        if not idx:
            raise KeyError(f"no step named {name!r}")
        out = list(self.steps)
        out.insert(idx[0] + 1, step)
        return Pipeline(out)


def flagship_pipeline(cfg=None) -> Pipeline:
    """The flagship A2→A15 chain expressed as a user-editable Pipeline."""
    from ..config import PipelineConfig
    from ..stages.assemble import assemble_batch
    from ..stages.extract import ExtractorActor
    from ..stages.sentencize import sentencize_batch
    from ..stages.validate import validate_batch

    cfg = cfg or PipelineConfig()
    return Pipeline(
        [
            Step("validate", validate_batch, fn_kwargs={"partitions": cfg.partitions}),
            Step("assemble", assemble_batch),
            Step("sentencize", sentencize_batch),
            Step(
                "extract",
                ExtractorActor,
                batch_size=cfg.extract_batch_size,
                concurrency=cfg.extract_concurrency,
                num_cpus=1,
                fn_constructor_kwargs={
                    "seed": cfg.seed,
                    "max_mentions": cfg.max_mentions_per_sentence,
                },
            ),
        ]
    )
