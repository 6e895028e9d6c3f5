"""The flagship transcript-extraction pipeline (north_rule shape).

    read_parquet(transcripts)
      -> map_batches(ExtractTurns, actor pool, zero-copy Arrow)   [expensive]
      -> sort(["conv_id", "turn_idx"])                            [the one wide shuffle]
      -> write_parquet(out)                                       [partitioned, resumable]

Design notes for 10^12-turn scale:

- **Checkpoint unit = input file.**  The expensive stage (parse +
  extract) runs per input file (or per group of files) and writes to
  ``out/extracted/<stem>/`` with an atomically-updated manifest entry
  (input fingerprint + row count + extraction counts).  A resumed run
  skips every finished partition — only the cheap final ordering pass
  re-runs.  At 100 TB the input is many thousands of files, so this is
  exactly the right granularity; lineage lives in the manifest.
- **Ordering shuffle.**  ``Dataset.sort`` on (conv_id, turn_idx) uses
  sample-based range partitioning, which spreads hot conv_ids across
  block boundaries without manual salting; for *grouped* per-conv work
  use ``ops.skew.salted_group_keys`` instead.
- **Actor pool sizing.**  Extraction is CPU-bound at ~1 CPU per actor;
  ``concurrency`` defaults to the cluster CPU count minus a reserve for
  the read/write stages so no stage starves (ray_guide: pool that
  reserves every CPU serializes the pipeline).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path
from typing import Any

import pyarrow as pa

from unfurl_ray.engine.stages import ExtractTurns


def _cpu_budget() -> int:
    import ray

    if ray.is_initialized():
        return int(ray.cluster_resources().get("CPU", os.cpu_count() or 4))
    return os.cpu_count() or 4


def extract_turns(
    ds,
    side_table_ref: Any = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
):
    """Attach the extraction stage (actor pool) to a transcript Dataset."""
    if concurrency is None:
        concurrency = max(2, _cpu_budget() - 2)
    return ds.map_batches(
        ExtractTurns,
        fn_constructor_kwargs={"side_table_ref": side_table_ref},
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def order_by_turn(ds, num_partitions: int | None = None):
    """Stable (conv_id, turn_idx) ordering — the one required shuffle.

    ``num_partitions`` coalesces blocks before the sort.  Ray's sort
    creates #blocks range partitions and each reduce merges #blocks
    fragments, so many small upstream blocks (the extract stage emits
    one block per input block) explode into blocks² tiny object-store
    fragments whose fixed overhead does not scale with CPUs (measured:
    a flat ~22 s for 256×3 MB blocks at both 8 and 32 CPUs).  Keep
    shuffle partitions sized by BYTES (~128-256 MB each), not by input
    file count: pass ``num_partitions ≈ max(2×CPUs, bytes/256 MB)``.
    """
    if num_partitions:
        ds = ds.repartition(num_partitions)
    return ds.sort(["conv_id", "turn_idx"])


# -- checkpoint / resume ----------------------------------------------------

def _fingerprint(path: str) -> str:
    # mtime at ns resolution: a same-size rewrite within the same
    # second must still invalidate the partition on resume
    st = os.stat(path)
    return f"{st.st_size}:{st.st_mtime_ns}"


def _load_manifest(manifest_path: Path) -> dict:
    if manifest_path.is_file():
        try:
            return json.loads(manifest_path.read_text())
        except ValueError:
            return {"partitions": {}}
    return {"partitions": {}}


def _save_manifest(manifest_path: Path, manifest: dict) -> None:
    tmp = manifest_path.with_suffix(".tmp")
    tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    tmp.replace(manifest_path)


def run_extraction_checkpointed(
    input_files: list[str],
    out_dir: str,
    side_table_ref: Any = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    files_per_partition: int = 1,
    resume: bool = True,
) -> dict:
    """Stage 1: per-partition extraction with manifest-based resume.

    Returns the manifest.  Each partition writes to
    ``out/extracted/<partition_id>/`` and is recorded with input
    fingerprints, row count and extraction-type counts (lineage +
    metrics per north_rule).
    """
    import ray.data as rd

    import shutil

    out = Path(out_dir)
    extracted = out / "extracted"
    if not resume and extracted.exists():
        # a fresh (non-resumed) run must not inherit stale partition
        # dirs from a previous layout (different files_per_partition,
        # shrunk input list, ...)
        shutil.rmtree(extracted)
    extracted.mkdir(parents=True, exist_ok=True)
    manifest_path = out / "manifest.json"
    manifest = _load_manifest(manifest_path) if resume else {"partitions": {}}

    groups = [
        input_files[i: i + files_per_partition]
        for i in range(0, len(input_files), files_per_partition)
    ]
    # prune manifest entries (and their dirs) for partitions beyond the
    # current input list — a shrunk input on resume must not leave
    # stale partitions that the final pass would merge
    current_ids = {f"part-{gi:05d}" for gi in range(len(groups))}
    for stale_id in [
        p for p in manifest["partitions"] if p not in current_ids
    ]:
        del manifest["partitions"][stale_id]
        shutil.rmtree(extracted / stale_id, ignore_errors=True)
    for gi, files in enumerate(groups):
        part_id = f"part-{gi:05d}"
        fps = {f: _fingerprint(f) for f in files}
        entry = manifest["partitions"].get(part_id)
        if entry and entry.get("inputs") == fps and entry.get("complete"):
            continue  # resume: skip finished partition
        t0 = time.time()
        ds = rd.read_parquet(files)
        ds = extract_turns(
            ds, side_table_ref=side_table_ref,
            concurrency=concurrency, batch_size=batch_size,
        )
        part_dir = extracted / part_id
        # write_parquet APPENDS (fresh write_uuid filenames): a changed
        # input fingerprint or a crash between write and manifest save
        # would otherwise leave old files underneath the rewrite and
        # silently double the partition
        shutil.rmtree(part_dir, ignore_errors=True)
        ds.write_parquet(str(part_dir))
        # lineage + metrics from the written partition (cheap re-read of
        # the small metadata columns only).
        stats = (
            rd.read_parquet(str(part_dir), columns=["unfurl_type"])
            .groupby("unfurl_type")
            .count()
            .to_pandas()
        )
        counts = dict(
            zip(stats["unfurl_type"].tolist(), stats["count()"].tolist())
        )
        manifest["partitions"][part_id] = {
            "inputs": fps,
            "rows": int(sum(counts.values())),
            "type_counts": {k: int(v) for k, v in counts.items()},
            "seconds": round(time.time() - t0, 2),
            "complete": True,
        }
        _save_manifest(manifest_path, manifest)
    return manifest


def run_pipeline(
    input_files: list[str],
    out_dir: str,
    side_table_ref: Any = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    files_per_partition: int = 1,
    resume: bool = True,
    order: bool = True,
) -> dict:
    """Full pipeline: checkpointed extraction + ordered final output."""
    import ray.data as rd

    manifest = run_extraction_checkpointed(
        input_files, out_dir,
        side_table_ref=side_table_ref,
        concurrency=concurrency, batch_size=batch_size,
        files_per_partition=files_per_partition, resume=resume,
    )
    extracted = Path(out_dir) / "extracted"
    # enumerate ONLY the manifest's partitions: stale dirs from an
    # earlier run with a different layout must not leak into the final
    # ordered output
    parts = sorted(
        str(f)
        for part_id in manifest["partitions"]
        for f in (extracted / part_id).glob("*.parquet")
    )
    ds = rd.read_parquet(parts)
    final_dir = Path(out_dir) / "final"
    # the ordering pass is all-or-nothing: write_parquet appends (file
    # names carry a fresh write_uuid), so a resumed/re-run pipeline
    # must replace the previous final output, not double it
    if final_dir.exists():
        import shutil

        shutil.rmtree(final_dir)
    # shuffle partitions by bytes (~256 MB each), floored at 2xCPUs so
    # every core participates in the reduce (see order_by_turn)
    total_bytes = sum(os.stat(p).st_size for p in parts)
    num_partitions = max(2 * _cpu_budget(), total_bytes // (256 << 20) + 1)
    if order:
        # preserve_order pins write-task order to the sort order, and
        # the filename provider makes file paths sort in that same
        # order — so path-sorted readers see globally ordered turns
        # (each file is one contiguous (conv_id, turn_idx) range).
        from ray.data.datasource import FilenameProvider

        class OrderedNames(FilenameProvider):
            def get_filename_for_block(self, block, write_uuid,
                                       task_index, block_index):
                # write_uuid must appear (append-mode guard); keeping it
                # after the numeric prefix preserves lexicographic order.
                return (
                    f"range-{task_index:06d}-{block_index:06d}"
                    f"-{write_uuid}.parquet"
                )

        ctx = rd.DataContext.get_current()
        prev = ctx.execution_options.preserve_order
        ctx.execution_options.preserve_order = True
        try:
            order_by_turn(ds, num_partitions=num_partitions).write_parquet(
                str(final_dir), filename_provider=OrderedNames()
            )
        finally:
            ctx.execution_options.preserve_order = prev
    else:
        ds.write_parquet(str(final_dir))
    manifest["final"] = {"path": str(final_dir)}
    _save_manifest(Path(out_dir) / "manifest.json", manifest)
    return manifest
