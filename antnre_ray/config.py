"""Pipeline configuration.

One dataclass, explicitly sized for scale: partition count (lineage
granularity), salt fan-out for skewed aggregations, actor-pool sizes and
batch sizes for the stateful stages. Defaults are tuned for the 32-CPU
sandbox; at cluster scale only these numbers change, not the code.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


def _default_cpus() -> int:
    # nproc lies inside the sandbox; sched_getaffinity is truthful.
    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        return os.cpu_count() or 8


def shuffle_width(divisor: int = 4, lo: int = 4, hi: int = 64) -> int:
    """Shuffle/join width sized to the LIVE Ray session: cpus/divisor,
    clamped. Join/shuffle aggregators are actors that hold a CPU each
    while the map side feeds them, so width == cpus starves producers
    (measured in pipelines/relational._join_partitions: 3.06 s at
    cpus/4 vs 3.45 s at cpus/2 vs 29 s at cpus, 600k-row join at 32
    CPUs). One shared helper so every stage retunes together.

    GRAFT_SHUFFLE_WIDTH overrides (experiments / cluster retuning):
    the cpu-divisor heuristic is a single-node sweet spot for
    bench-scale tables; at other data:cpu ratios the right width
    differs (measured on a 9.6M-row join at 16 CPUs: width 4 -> 13.1 s,
    width 8 is faster — see BASELINE.md round-5 width A/B)."""
    env = os.environ.get("GRAFT_SHUFFLE_WIDTH")
    if env:
        # validate once, loudly: a zero/negative/garbage override would
        # otherwise surface as num_partitions errors deep inside ~15
        # query plans (round-5 review finding)
        try:
            width = int(env)
        except ValueError:
            raise ValueError(
                f"GRAFT_SHUFFLE_WIDTH={env!r} is not an integer"
            ) from None
        return max(1, width)
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(lo, min(hi, cpus // divisor))


def tune_data_context() -> None:
    """Session-level Ray Data tuning, applied lazily by every read
    helper (idempotent, re-checked per live session).

    read_op_min_num_blocks: Ray's default floor of 200 output blocks
    per read shreds small/medium tables into ~2 MB blocks whose
    per-task overhead dominates the pipeline (measured on a 9.6M-row /
    400 MB pre-aggregation at 4 CPUs: 208 blocks -> 5.4 s wall for
    2.3 core-s of real work, 11 % utilization; floor 2×cpus -> 0.8 s
    warm). A CPU-scaled floor keeps full parallelism headroom at every
    cluster size — at 100-TB table sizes the SIZE-based block count
    (bytes / target_max_block_size) exceeds any floor, so this only
    affects the small/medium reads the default was hurting."""
    import ray
    import ray.data

    ctx = ray.data.DataContext.get_current()
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0)) or _default_cpus()
    except Exception:
        cpus = _default_cpus()
    ctx.read_op_min_num_blocks = max(2 * cpus, 8)


@dataclass
class PipelineConfig:
    """Knobs for the flagship KG-construction pipeline (SURVEY.md §3.2)."""

    input_path: str = ""
    output_path: str = "/tmp/antkg_out"
    # Lineage/partition granularity: partition_id = stable_hash(doc_id) % partitions.
    partitions: int = 8
    # Salt fan-out for the two-phase skew-defusing canonicalization (A18).
    salt: int = 8
    # Extractor actor pool (A15): sentences per forward batch, pool size.
    # Autoscaling (min, max) so the pool fits whatever CPU budget the
    # current Ray session actually has (a fixed int would deadlock when
    # the session is smaller than the pool).
    extract_batch_size: int = 512
    extract_concurrency: int | tuple[int, int] = field(
        default_factory=lambda: (1, max(2, _default_cpus() - 2))
    )
    # GPUs per extractor actor (north-star "GPU actor pools"): 0 in this
    # CPU-only sandbox; on a GPU cluster set e.g. 1 (or a fraction for
    # MPS sharing) and Ray schedules the pool onto GPU nodes. The numpy
    # kernels are the CPU reference; a torch/CUDA checkpoint would slot
    # in at ExtractorActor.__init__ without touching the pipeline shape.
    extract_num_gpus: float = 0.0
    # Linker actor pool (A16).
    link_batch_size: int = 1024
    link_concurrency: int | tuple[int, int] = (1, 4)
    # Link-score threshold: below it, the mention falls through to
    # canonicalization-assigned ids.
    link_threshold: float = 0.85
    # Cap on mentions per sentence fed to the O(K^2) pair generator (A12).
    max_mentions_per_sentence: int = 10
    # Bounded provenance: at most this many doc ids collected per edge (A19).
    max_docs_per_edge: int = 16
    # Deterministic seed for the reference-spec checkpoint stand-in.
    seed: int = 42
    # Shuffle width for joins / grouped aggregations at this data size.
    shuffle_partitions: int = 32
