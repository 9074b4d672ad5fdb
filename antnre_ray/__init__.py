"""antnre_ray — a Ray-Data-native knowledge-graph construction engine.

A brand-new engine (NOT a port) with the query/data-processing
capabilities of the reference ``changzhisun/AntNRE`` (joint NER + RE →
(subj, pred, obj) triples), re-expressed idiomatically on
``ray.data.Dataset``: ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful model stages, groupby/sort for the wide steps,
streaming execution throughout.

Layout (SURVEY.md §2/§7 is the blueprint; reference checkout was empty,
see SURVEY.md §0 — loci cited as BASELINE.json:N / upstream:UNVERIFIED):

- ``sources``   — IO facade (Lance when importable, Parquet fallback) and
                  the interleaved-document corpus deriver (FIXTURES.md F1).
- ``functions`` — pure kernels: tokenization, normalization, stable
                  hashing, minhash/simhash, text statistics, and the
                  numpy model kernels (BiLSTM, CRF/Viterbi, biaffine)
                  plus the seeded reference-spec checkpoint stand-in.
- ``stages``    — Dataset → Dataset operators (validate, assemble,
                  sentencize, extract, link, canonicalize, materialize,
                  dedup, similarity, media, analyze).
- ``pipelines`` — composed pipelines (flagship KG construction, the
                  relational conformance library, eval scorer).
- ``state``     — per-partition lineage manifest, resume, metrics.

Library code NEVER calls ``ray.init``/``ray.shutdown`` — the driver,
``bench.py`` and the pytest session fixture own the Ray session
(__ray_entry__.py contract).
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy public API (avoids importing Ray at package import time):

    ``flagship_graph``, ``flagship_triples``, ``Pipeline``, ``Step``,
    ``PipelineConfig``, ``run_flagship_resumable``, ``derive_interleaved``.
    """
    from importlib import import_module

    api = {
        "flagship_graph": ("antnre_ray.pipelines.flagship", "flagship_graph"),
        "flagship_triples": ("antnre_ray.pipelines.flagship", "flagship_triples"),
        "reference_graph": ("antnre_ray.pipelines.flagship", "reference_graph"),
        "Pipeline": ("antnre_ray.pipelines.api", "Pipeline"),
        "Step": ("antnre_ray.pipelines.api", "Step"),
        "flagship_pipeline": ("antnre_ray.pipelines.api", "flagship_pipeline"),
        "PipelineConfig": ("antnre_ray.config", "PipelineConfig"),
        "run_flagship_resumable": ("antnre_ray.state.lineage", "run_flagship_resumable"),
        "run_report": ("antnre_ray.state.metrics", "run_report"),
        "derive_interleaved": ("antnre_ray.sources.corpus", "derive_interleaved"),
        "synthesize_documents": ("antnre_ray.sources.corpus", "synthesize_documents"),
        "connected_components": ("antnre_ray.stages.graph_algos", "connected_components"),
        "pagerank": ("antnre_ray.stages.graph_algos", "pagerank"),
        "merge_adjacency": ("antnre_ray.stages.materialize", "merge_adjacency"),
        "build_ann_index": ("antnre_ray.stages.similarity", "build_ann_index"),
        "query_ann_index": ("antnre_ray.stages.similarity", "query_ann_index"),
        "build_ivf_index": ("antnre_ray.stages.similarity", "build_ivf_index"),
        "query_ivf_index": ("antnre_ray.stages.similarity", "query_ivf_index"),
        "build_ivfpq_index": ("antnre_ray.stages.similarity", "build_ivfpq_index"),
        "query_ivfpq_index": ("antnre_ray.stages.similarity", "query_ivfpq_index"),
        "refine_topk": ("antnre_ray.stages.similarity", "refine_topk"),
        "triangle_count": ("antnre_ray.stages.graph_algos", "triangle_count"),
        "kcore": ("antnre_ray.stages.graph_algos", "kcore"),
        "edit_distance_join": ("antnre_ray.pipelines.relational", "edit_distance_join"),
        "quantile_range_boundaries": ("antnre_ray.stages.partition", "quantile_range_boundaries"),
        "assign_range_partition": ("antnre_ray.stages.partition", "assign_range_partition"),
        "semantic_dedup": ("antnre_ray.stages.dedup", "semantic_dedup"),
        "substring_dedup": ("antnre_ray.stages.dedup", "substring_dedup"),
        "kmeans_assign": ("antnre_ray.stages.similarity", "kmeans_assign"),
        "label_propagation": ("antnre_ray.stages.graph_algos", "label_propagation"),
        "bfs_depth": ("antnre_ray.stages.graph_algos", "bfs_depth"),
        "shortest_path": ("antnre_ray.stages.graph_algos", "shortest_path"),
        "zorder_sort": ("antnre_ray.stages.partition", "zorder_sort"),
        "zorder_interleave": ("antnre_ray.stages.partition", "zorder_interleave"),
        "zorder_pruning_stats": ("antnre_ray.stages.partition", "zorder_pruning_stats"),
        "corpus_divergence": ("antnre_ray.stages.analyze", "corpus_divergence"),
        "union_aligned": ("antnre_ray.sources.io", "union_aligned"),
        "compact_parquet_dir": ("antnre_ray.sources.io", "compact_parquet_dir"),
        "harmonic_centrality": ("antnre_ray.stages.graph_algos", "harmonic_centrality"),
        "clean_text": ("antnre_ray.stages.analyze", "clean_text"),
        "topk_ngrams": ("antnre_ray.stages.analyze", "topk_ngrams"),
        "frame_dedup_pairs": ("antnre_ray.stages.media", "frame_dedup_pairs"),
        "plan_join": ("antnre_ray.pipelines.relational", "plan_join"),
        "expectations_report": ("antnre_ray.stages.expect", "expectations_report"),
        "bipartite_project": ("antnre_ray.stages.graph_algos", "bipartite_project"),
        "association_rules": ("antnre_ray.stages.graph_algos", "association_rules"),
        "dsir_log_weights": ("antnre_ray.stages.analyze", "dsir_log_weights"),
        "dsir_select": ("antnre_ray.stages.analyze", "dsir_select"),
    }
    if name in api:
        mod, attr = api[name]
        return getattr(import_module(mod), attr)
    raise AttributeError(f"module 'antnre_ray' has no attribute {name!r}")
