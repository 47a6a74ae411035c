"""Overlay-pass framework: ordered, additive, resumable, metered.

Re-expresses the reference's layering machinery over parquet delta dirs:

* every pass is a pure function ``tables-so-far → delta tables`` — the
  DiffGraph idea (`codepropertygraph/.../passes/CpgPass.scala:17-41`,
  `DiffGraph.scala:114-146`) with Arrow tables as the delta representation;
* each applied pass is serialized under a **numbered directory**
  ``{index:02d}_{name}/{table}/`` and re-applied in sorted numeric order,
  exactly the overlay-zip layout and ordering of
  `ProtoCpgLoader.scala:57-75`;
* a ledger of applied passes enables skip-if-done resumption, the
  semantics of `semanticcpg/.../layers/LayerCreator.scala:18-29` +
  `Overlays.appendOverlayName` (`Overlays.scala:9-17`);
* per-pass and per-output-file (≈ per partition) row-count/latency metrics
  are recorded in the ledger — the lineage/metrics requirement of the
  north rule (the reference only logs wall clock, `CpgPass.scala:130-139`).

Inverse overlays (`DiffGraphProtoSerializer.scala:65-87`): every applied
pass serializes its inverse diff as DATA at apply time — ``inverse.json``
in the numbered directory, listing the remove-table operations that revert
it (all overlays here are additive, so the inverse of "add these tables"
is "remove these tables"). ``undo_pass`` executes the stored inverse
rather than guessing.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable

import pyarrow.parquet as pq

LEDGER = "ledger.json"
SUCCESS = "_SUCCESS"
INVERSE = "inverse.json"

# at/above this many part files, Dataset reads switch from the native
# read_parquet (driver-serial per-file metadata prefetch at construction)
# to sources.fastread's in-task group reader
_FAST_READ_MIN_FILES = 32


def blocks_per_cpu() -> int:
    """Task granularity knob: blocks per CPU for delta reads (and the base
    read). 1 minimizes fixed per-task dispatch cost (the quiet-box
    optimum); 2 halves the straggler penalty of full-width barrier stages
    when core speeds are uneven (co-tenant steal). Env-tunable so a noisy
    deployment can flip it without a code change."""
    return max(1, int(os.environ.get("GRAFT_BLOCKS_PER_CPU", "1")))


# logical table name → (producing CORE pass, table). Increments (and any
# other extra overlay pass) expose the SAME table name under their own
# numbered inc_* dir; union-reading the logical name sees base + overlays —
# the GraphView nodes/edges union generalized to every pipeline table, per
# the overlay-loader semantics of `ProtoCpgLoader.scala:57-75`.
LOGICAL_TABLES = {
    "records": ("base", "records"),
    "entity_keys": ("entities", "entity_keys"),
    "canon_map": ("entities", "canon_map"),
    "triples": ("link", "triples"),
    "reaching": ("link", "reaching"),
    "linked_canons": ("link", "linked_canons"),
    "dom": ("materialize", "dom"),
    "nodes": ("materialize", "nodes"),
    "edges": ("materialize", "edges"),
    "ndim": ("materialize", "ndim"),
    "tprops": ("materialize", "tprops"),
}


def _expand_parquet(dirs: list[str]) -> list[str]:
    files = []
    for d in dirs:
        if os.path.isdir(d):
            files.extend(
                sorted(
                    os.path.join(d, f)
                    for f in os.listdir(d)
                    if f.endswith(".parquet")
                )
            )
        elif os.path.isfile(d):
            files.append(d)
    return files


@dataclass
class PassContext:
    """Handed to each pass; passes exchange data only through overlay dirs
    (pure function of prior parquet state ⇒ byte-stable resumption)."""

    out_dir: str
    sf_dir: str
    params: dict = field(default_factory=dict)
    _dirs: dict[str, str] = field(default_factory=dict)  # "pass/table" → dir
    _side_root: str | None = None  # the RUNNING pass's numbered dir

    # -- logical (base ∪ overlays) reads -------------------------------------
    def overlay_dirs(self, logical: str) -> list[str]:
        """All delta dirs exposing ``logical``: the core pass's delta first,
        then every extra overlay's same-named table in numbered order."""
        base_pass, table = LOGICAL_TABLES[logical]
        base_key = f"{base_pass}/{table}"
        dirs = [self.delta_dir(base_pass, table)]
        dirs += [
            d
            for k, d in sorted(self._dirs.items(), key=lambda kv: kv[1])
            if k != base_key and k.split("/", 1)[1] == table
        ]
        return dirs

    def logical_files(self, logical: str) -> list[str]:
        return _expand_parquet(self.overlay_dirs(logical))

    def logical_bytes(self, logical: str) -> int:
        return sum(os.path.getsize(f) for f in self.logical_files(logical))

    def read_logical(self, logical: str, columns: list[str] | None = None):
        """Union Dataset over base + every overlay exposing ``logical``."""
        import ray
        import ray.data

        files = self.logical_files(logical)
        if not files:  # all deltas empty → typed read of the base dir
            base_pass, table = LOGICAL_TABLES[logical]
            return self.read(base_pass, table, columns=columns)
        # same width policy as ctx.read: blocks are split/coalesced views
        # of row groups, so a many-file delta still reads as ncpu×bpc
        # blocks — len(files) tasks (one per written part) measured +2.4 s
        # on the validate pass at sf0.1 from dispatch overhead alone
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        if len(files) >= _FAST_READ_MIN_FILES:
            # native read_parquet prefetches per-file metadata on the
            # driver at CONSTRUCTION time — 4.5 s for the 408-part edges
            # delta at sf0.4, O(file count), width-independent. The
            # manual group-read defers all IO to the tasks.
            from ..sources.fastread import fast_read_parquet

            return fast_read_parquet(
                files, columns=columns, num_tasks=ncpu * blocks_per_cpu()
            )
        return ray.data.read_parquet(
            files, columns=columns,
            override_num_blocks=ncpu * blocks_per_cpu(),
        )

    def read_logical_table(self, logical: str, columns=None):
        """Driver-side Arrow union — only for vocab-scale logical tables."""
        import pyarrow as pa
        import pyarrow.parquet as pqt

        files = self.logical_files(logical)
        if not files:
            base_pass, table = LOGICAL_TABLES[logical]
            return self.read_table(base_pass, table, columns=columns)
        tbls = [pqt.read_table(f, columns=columns) for f in files]
        return tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls, promote_options="default")

    def side_dir(self, table: str) -> str:
        """Directory for a side-written table of the currently running pass
        (workers write deterministic per-bucket files into it; the runner
        registers + meters it after the pass completes)."""
        if self._side_root is None:
            raise RuntimeError("side_dir() is only valid while a pass runs")
        d = os.path.join(self._side_root, table)
        os.makedirs(d, exist_ok=True)
        return d

    def delta_dir(self, pass_name: str, table: str) -> str:
        key = f"{pass_name}/{table}"
        if key not in self._dirs:
            raise KeyError(f"no delta written for {key}; have {sorted(self._dirs)}")
        return self._dirs[key]

    def has_delta(self, pass_name: str, table: str) -> bool:
        return f"{pass_name}/{table}" in self._dirs

    def read(self, pass_name: str, table: str, columns: list[str] | None = None):
        import ray
        import ray.data

        # Ray's auto read parallelism keys off bytes and can settle on ~16
        # blocks for a coalesced delta, capping every downstream stage
        # below cluster width; ask for blocks_per_cpu() blocks per CPU
        # (blocks are split views of row groups, not extra reads). Default
        # ONE per CPU: per-task driver dispatch cost (~10 ms) scales with
        # task count, i.e. with cluster width — 2× slack measurably
        # flattened 8→32 scaling on a quiet box. On a box with UNEVEN core
        # speeds (co-tenant steal pinning some cores), every full-width
        # barrier waits for the slowest core and finer blocks rebalance:
        # set GRAFT_BLOCKS_PER_CPU=2 there (measured trade-off in
        # BASELINE.md 'Scaling').
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        d = self.delta_dir(pass_name, table)
        nfiles = sum(1 for f in os.listdir(d) if f.endswith(".parquet"))
        if nfiles >= _FAST_READ_MIN_FILES:
            # see read_logical: skip the driver-serial per-file metadata
            # prefetch for many-part deltas
            from ..sources.fastread import fast_read_parquet

            return fast_read_parquet(
                d, columns=columns, num_tasks=ncpu * blocks_per_cpu()
            )
        return ray.data.read_parquet(
            d,
            columns=columns,
            override_num_blocks=ncpu * blocks_per_cpu(),
        )

    def read_table(self, pass_name: str, table: str, columns=None):
        """Driver-side Arrow materialization — only for vocab-scale deltas."""
        import pyarrow.dataset as pads

        d = pads.dataset(self.delta_dir(pass_name, table))
        return d.to_table(columns=columns)


@dataclass
class Pass:
    """`CpgPassBase` analog: name + dependencies + run()→named deltas.

    ``run(ctx)`` returns ``{table_name: ray.data.Dataset | pyarrow.Table}``;
    the runner writes each to the pass's numbered overlay directory.
    """

    name: str
    run: Callable[[PassContext], dict]
    depends_on: tuple[str, ...] = ()


def _file_metrics(table_dir: str) -> list[dict]:
    # serial on purpose: footers are page-cache-warm right after the pass
    # writes them (measured 0.23 s for the whole sf0.1 output; a thread
    # pool per call was 6× WORSE from pool-spawn overhead)
    out = []
    if not os.path.isdir(table_dir):  # empty delta → writer may skip the dir
        return out
    for f in sorted(os.listdir(table_dir)):
        p = os.path.join(table_dir, f)
        if f.endswith(".parquet") and os.path.isfile(p):
            md = pq.read_metadata(p)
            out.append({"file": f, "rows": md.num_rows, "bytes": os.path.getsize(p)})
    return out


class PipelineRunner:
    """`Scpg.create` analog (`semanticcpg/.../layers/Scpg.scala:43-49`):
    iterate the ordered pass list; apply + serialize + store each; skip
    passes already in the ledger (resume)."""

    def __init__(self, passes: list[Pass], out_dir: str, sf_dir: str, params: dict | None = None):
        self.passes = passes
        self.out_dir = out_dir
        self.sf_dir = sf_dir
        self.ctx = PassContext(out_dir=out_dir, sf_dir=sf_dir, params=params or {})
        os.makedirs(out_dir, exist_ok=True)

    # -- ledger -------------------------------------------------------------
    @property
    def _ledger_path(self) -> str:
        return os.path.join(self.out_dir, LEDGER)

    def ledger(self) -> dict:
        if os.path.exists(self._ledger_path):
            with open(self._ledger_path) as f:
                return json.load(f)
        return {"applied": [], "metrics": {}}

    def _save_ledger(self, led: dict) -> None:
        tmp = self._ledger_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(led, f, indent=1, sort_keys=True)
        os.replace(tmp, self._ledger_path)

    def _pass_dir(self, idx: int, name: str) -> str:
        return os.path.join(self.out_dir, f"{idx:02d}_{name}")

    # -- execution ----------------------------------------------------------
    def run(self) -> dict:
        led = self.ledger()
        applied = set(led["applied"])
        for idx, p in enumerate(self.passes):
            pdir = self._pass_dir(idx, p.name)
            if p.name in applied and os.path.exists(os.path.join(pdir, SUCCESS)):
                self._register_outputs(p.name, pdir)
                continue  # resume-by-skip (LayerCreator.scala:18-29)
            missing = [d for d in p.depends_on if d not in applied]
            if missing:
                raise RuntimeError(f"pass {p.name} missing deps {missing}")
            self._execute(p, pdir, led)
            applied.add(p.name)
        # re-register applied EXTRA passes (run_extra) on resume so their
        # overlay dirs stay visible to GraphView/ctx.read
        core = {p.name for p in self.passes}
        for name in led["applied"]:
            if name not in core:
                pdir = self._find_pass_dir(name)
                if pdir and os.path.exists(os.path.join(pdir, SUCCESS)):
                    self._register_outputs(name, pdir)
        return led

    def run_extra(self, p: Pass) -> dict:
        """Run an ad-hoc pass APPENDED after the core list — the
        user-extension surface (`samples/pass/.../SamplePass.scala:1-25`,
        `LayerCreator.scala:10-47`): numbered after everything applied so
        far, ledgered, skipped on resume like any core pass. Used by the
        tagging write-back (traversal.tag_pass)."""
        led = self.ledger()
        if p.name in led["applied"]:
            pdir = self._find_pass_dir(p.name)
            if pdir and os.path.exists(os.path.join(pdir, SUCCESS)):
                self._register_outputs(p.name, pdir)
                return led
        pdir = self._pass_dir(len(led["applied"]), p.name)
        self._execute(p, pdir, led)
        return led

    def _find_pass_dir(self, name: str) -> str | None:
        import glob as _glob

        hits = _glob.glob(os.path.join(self.out_dir, f"[0-9][0-9]_{name}"))
        return hits[0] if hits else None

    def _execute(self, p: Pass, pdir: str, led: dict) -> None:
        if os.path.exists(pdir):
            shutil.rmtree(pdir)  # partial output from a crashed run
        t0 = time.perf_counter()
        self.ctx._side_root = pdir  # passes may side-write extra tables
        deltas = p.run(self.ctx)
        metrics: dict = {"tables": {}}
        for tname, data in deltas.items():
            tdir = os.path.join(pdir, tname)
            tw0 = time.perf_counter()
            if callable(data):
                # deferred delta: computed AFTER earlier tables of this
                # pass are on disk, so it can read them back instead of
                # re-executing their lineage
                data = data(self.ctx)
            _write_delta(data, tdir)
            fm = _file_metrics(tdir)
            metrics["tables"][tname] = {
                "files": fm,
                "rows": sum(m["rows"] for m in fm),
                "wall_sec": round(time.perf_counter() - tw0, 4),
            }
            self.ctx._dirs[f"{p.name}/{tname}"] = tdir
        # side-written tables: a fused stage may emit a SECOND delta from
        # inside its shuffle (one execution, two outputs — e.g. the link
        # pass's spo-bucketed triples dedup side-writes the conv-bucketed
        # reaching pairs). Register + meter any table dir the pass wrote
        # directly under its numbered directory.
        if os.path.isdir(pdir):
            for tname in sorted(os.listdir(pdir)):
                tdir = os.path.join(pdir, tname)
                if os.path.isdir(tdir) and tname not in metrics["tables"]:
                    fm = _file_metrics(tdir)
                    metrics["tables"][tname] = {
                        "files": fm,
                        "rows": sum(m["rows"] for m in fm),
                    }
                    self.ctx._dirs[f"{p.name}/{tname}"] = tdir
        metrics["wall_sec"] = round(time.perf_counter() - t0, 4)
        os.makedirs(pdir, exist_ok=True)
        # serialize the INVERSE diff alongside the overlay, the
        # DiffGraphProtoSerializer.scala:65-87 discipline: applying a pass
        # also records, as data, exactly how to revert it (all overlays are
        # additive, so the inverse is an ordered remove-table list)
        inverse = {
            "pass": p.name,
            "inverse": [
                {"op": "remove_table", "table": t, "rows": m["rows"]}
                for t, m in sorted(metrics["tables"].items())
            ],
        }
        with open(os.path.join(pdir, INVERSE), "w") as f:
            json.dump(inverse, f, indent=1, sort_keys=True)
        with open(os.path.join(pdir, SUCCESS), "w") as f:
            f.write("ok\n")
        led["applied"].append(p.name)
        led["metrics"][p.name] = metrics
        self._save_ledger(led)

    def _register_outputs(self, pass_name: str, pdir: str) -> None:
        for tname in sorted(os.listdir(pdir)):
            tdir = os.path.join(pdir, tname)
            if os.path.isdir(tdir):
                self.ctx._dirs[f"{pass_name}/{tname}"] = tdir

    def undo_pass(self, name: str) -> None:
        """Inverse-overlay semantics (`CpgOverlayLoader.loadInverse` /
        `DiffGraph.scala:258-298` analog): apply each pass's SERIALIZED
        inverse (the ``inverse.json`` written at apply time), newest first.
        Later passes are undone too (they may depend on this one)."""
        led = self.ledger()
        if name not in led["applied"]:
            return
        pos = led["applied"].index(name)
        for later in reversed(led["applied"][pos:]):
            pdir = self._find_pass_dir(later)
            if pdir and os.path.exists(pdir):
                inv_path = os.path.join(pdir, INVERSE)
                if os.path.exists(inv_path):
                    with open(inv_path) as f:
                        for op in json.load(f)["inverse"]:
                            tdir = os.path.join(pdir, op["table"])
                            if op["op"] == "remove_table" and os.path.isdir(tdir):
                                shutil.rmtree(tdir)
                shutil.rmtree(pdir)  # markers + any table the inverse predates
            led["metrics"].pop(later, None)
            # purge stale dir registrations: a later ctx.read() must get the
            # framework's clear 'no delta written' KeyError, not a dangling
            # path to a deleted directory
            for key in [k for k in self.ctx._dirs if k.startswith(f"{later}/")]:
                del self.ctx._dirs[key]
        led["applied"] = led["applied"][:pos]
        self._save_ledger(led)


def _write_delta(data, tdir: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pqt

    # zstd on every delta: the sandbox disk throttles buffered writeback to
    # ~30 MB/s per writer (measured; O_DIRECT gets 433 MB/s) — written
    # bytes are the one resource more CPUs cannot buy, so spend (scaling)
    # CPU to halve the (non-scaling) IO
    if isinstance(data, pa.Table):
        os.makedirs(tdir, exist_ok=True)
        pqt.write_table(
            data.replace_schema_metadata(None),
            os.path.join(tdir, "part-0.parquet"),
            compression="zstd",
        )
    else:  # ray.data.Dataset — streamed, multi-file (resumable layout)
        # in-task single-threaded sink, NOT Dataset.write_parquet: Ray's
        # Write operator runs pyarrow.dataset.write_dataset per task,
        # whose process-global thread pool (sized to all cores) thrashes
        # under concurrent writers — measured ~1.5 s fixed cost per write
        # task at 32 cpus vs ~tens of ms for plain pq.write_table (see
        # functions/sink.py). The sink fuses into the producing tasks, so
        # no bundling/min_rows coalescing ever caps upstream parallelism.
        from ..functions.sink import sink_parquet

        sink_parquet(data, tdir)
