"""Type layer: distance enums and index metadata.

Mirrors the reference's meta page (pgvectorscale/src/access_method/
meta_page.rs:179-210) — the index-wide configuration record — as a plain
dataclass persisted as a JSON sidecar next to the parquet node table.
Defaults mirror the reference (meta_page.rs:284-334, README.md:325-332):
num_neighbors=50, search_list_size=100, max_alpha=1.2,
bits/dim = 2 if dims < 900 else 1.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from enum import Enum


class DistanceType(str, Enum):
    """Distance semantics (reference: src/access_method/distance/mod.rs:52-65).

    - COSINE: vectors L2-normalized at ingest and query; distance =
      max(0, 1 - dot)  (distance/mod.rs:193-223, 225-253)
    - L2: **squared** euclidean — sqrt skipped, order-only
      (distance/mod.rs:88-117)
    - INNER_PRODUCT: negated dot product (distance/mod.rs:173-190)
    """

    COSINE = "cosine"
    L2 = "l2"
    INNER_PRODUCT = "inner_product"


class StorageType(str, Enum):
    """Storage layouts (reference: src/access_method/storage.rs:144-168)."""

    SBQ = "memory_optimized"  # quantized codes + rescore (default)
    PLAIN = "plain"  # full f32 vectors in the graph


# Reference defaults (meta_page.rs:284-334; guc.rs:3-4)
DEFAULT_NUM_NEIGHBORS = 50
DEFAULT_SEARCH_LIST_SIZE = 100
DEFAULT_MAX_ALPHA = 1.2
DEFAULT_QUERY_SEARCH_LIST_SIZE = 100
DEFAULT_QUERY_RESCORE = 50
# build-time slack: neighbor lists may exceed R by 1.3x before the final
# prune (meta_page.rs:24, 253-255)
NEIGHBOR_SLACK = 1.3
MAX_DIMENSIONS = 16_000  # build.rs:192
MAX_DIMENSIONS_PLAIN = 2_000  # build.rs:196
SBQ_NBIT_DIM_CAP = 900  # meta_page.rs:312-323


# on-disk index meta format revision this reader understands.
# V1 -> V2: added `mutation_id`, the per-mutation cache nonce (V1 used the
# integer `epoch` alone, which a failed mutation job could collide with).
# V2 -> V3: added `shard_mutations` (per-shard nonces) — mutations now
# invalidate executor caches ONLY for the shards they touched; a V2 reader
# would keep serving stale caches for touched shards, hence the bump.
# V3 -> V4: added `has_mutations` — True once insert() ever ran, so
# cost-based SQL routing never bypasses the index to an exact scan of the
# REGISTERED table (which would drop index-only inserted rows, the mirror
# image of the tombstone guard).
# V4 -> V5: snapshot-isolated base store. The base dir is named by
# `base_rel` (rebuilds write a FRESH generation dir and flip this pointer
# instead of overwriting `nodes/` in place), folds write touched shards
# into fresh `nodes_gens/<id>` dirs recorded per shard in `shard_base`,
# delta generations carry explicit unique dir names in `delta_gens`
# (numbered by the never-reset `delta_counter`, so a post-fold mutation
# can never overwrite a dir an in-flight reader is still merging), and
# superseded dirs wait one maintenance cycle in `trash_dirs` before the
# next fold/rebuild sweeps them. `delta_seq` (the old chain-length field)
# is now derived from `delta_gens`.
CURRENT_META_VERSION = 5


def _migrate_v1(raw: dict) -> dict:
    """V1 -> V2: synthesize a deterministic mutation_id from the epoch
    counter. Deterministic (not random) on purpose: two readers loading the
    same V1 index must agree on the cache token, exactly as they agree on
    the epoch it encodes."""
    raw = dict(raw)
    raw.setdefault("mutation_id", f"v1:{int(raw.get('epoch', 0))}")
    raw["version"] = 2
    return raw


def _migrate_v2(raw: dict) -> dict:
    """V2 -> V3: no per-shard nonces recorded yet — an empty map means every
    shard serves under the index-wide mutation_id, exactly the V2 regime.
    Pre-V3 writers never tracked tombstones, so assume they exist: the only
    consequence is that cost-based routing keeps using the index (the
    pre-V3 behavior for every query)."""
    raw = dict(raw)
    raw.setdefault("shard_mutations", {})
    raw.setdefault("has_tombstones", True)
    raw["version"] = 3
    return raw


def _migrate_v3(raw: dict) -> dict:
    """V3 -> V4: pre-V4 writers never recorded whether insert() ran, so
    assume it did (epoch > 0 means *some* mutation happened). Consequence is
    only that cost routing keeps using the index — safe, never wrong."""
    raw = dict(raw)
    raw.setdefault("has_mutations", int(raw.get("epoch", 0)) > 0)
    raw["version"] = 4
    return raw


def _migrate_v4(raw: dict) -> dict:
    """V4 -> V5: a V4 index has its whole base under `nodes/` and its delta
    chain at `nodes_delta/seq=1..delta_seq` — express exactly that layout in
    the explicit V5 fields. The counter starts at the old chain length so
    the next mutation's dir name never collides with a live generation."""
    raw = dict(raw)
    n = int(raw.get("delta_seq", 0) or 0)
    raw.setdefault("base_rel", "nodes")
    raw.setdefault("shard_base", {})
    raw.setdefault("delta_gens", [f"nodes_delta/seq={k}" for k in range(1, n + 1)])
    raw.setdefault("delta_counter", n)
    raw.setdefault("trash_dirs", [])
    raw.pop("delta_seq", None)
    raw["version"] = 5
    return raw


# version -> migration to the NEXT version; applied in sequence on read,
# mirroring the reference's meta-page auto-migration chain
# (/root/reference/pgvectorscale/src/access_method/meta_page.rs:29-162,
# upgrade_test.rs:25-337)
_META_MIGRATIONS = {1: _migrate_v1, 2: _migrate_v2, 3: _migrate_v3, 4: _migrate_v4}


def default_bits_per_dimension(num_dimensions: int) -> int:
    """2 bits/dim below 900 dims, else 1 (meta_page.rs:312-323)."""
    return 2 if num_dimensions < SBQ_NBIT_DIM_CAP else 1


@dataclass
class IndexMeta:
    """Index-wide metadata (reference meta page, meta_page.rs:179-210)."""

    distance_type: str = DistanceType.COSINE.value
    storage_type: str = StorageType.SBQ.value
    num_dimensions: int = 0
    num_dimensions_to_index: int = 0  # Matryoshka truncation; 0 = all
    num_neighbors: int = DEFAULT_NUM_NEIGHBORS
    search_list_size: int = DEFAULT_SEARCH_LIST_SIZE
    max_alpha: float = DEFAULT_MAX_ALPHA
    bits_per_dimension: int = 0  # 0 = derive from dims at build
    has_labels: bool = False
    num_shards: int = 0
    num_rows: int = 0
    version: int = CURRENT_META_VERSION
    # mutation epoch: bumped by insert/delete/compact so executor-side shard
    # caches (diskann._SHARD_GRAPH_CACHE) invalidate without any coordination
    epoch: int = 0
    # random id minted per build(): executor cache keys include it, so a
    # rebuild after an out-of-band directory wipe (which resets the epoch
    # counter) can never be served stale entries from long-lived workers
    build_id: str = ""
    # random nonce minted per mutation ATTEMPT and committed only on job
    # success. Executor caches key on (build_id, per-shard nonce): entries a
    # failed job pre-populated sit under a nonce no later mutation can ever
    # commit (an epoch counter would collide — the next successful mutation
    # would commit the failed job's epoch+1 and serve its graphs)
    mutation_id: str = ""
    # per-shard mutation nonces: a mutation rotates ONLY its touched shards'
    # entries, so a micro-batch into one shard of a 1000-shard index leaves
    # the other 999 shards' executor caches hot. Shards absent from the map
    # serve under the build-time mutation_id. JSON object keys are strings.
    shard_mutations: dict[str, str] = field(default_factory=dict)
    # True once any delete tombstoned rows (cleared by compact's rebuild).
    # Cost-based SQL routing must NOT bypass the index while tombstones
    # exist: the registered table still has those rows, so an exact table
    # scan would resurface them.
    has_tombstones: bool = False
    # True once insert() ever ran. The index may then hold rows ABSENT from
    # the SQL-registered base table, so cost-based routing must never bypass
    # the index to an exact table scan (mirror of the tombstone guard:
    # tombstones = table superset of index; mutations = index superset of
    # table). Sticky across compact — compaction keeps inserted rows live.
    has_mutations: bool = False
    # 'hash' (balanced, no routing) or 'kmeans' (Voronoi shards, routable)
    shard_assignment: str = "hash"
    # ---- snapshot-isolated node store (V5) ----
    # Every data directory is immutable once its meta is committed: writers
    # create FRESH dirs and flip pointers here, never rewrite in place, so
    # an unsynchronized reader sees either the old snapshot or the new one,
    # never a torn mix (the Iceberg snapshot pattern over plain parquet).
    #
    # Name of the CURRENT base dir (relative to the index path). Fresh
    # builds use "nodes"; a rebuild at a live path writes a new generation
    # dir and flips this pointer.
    base_rel: str = "nodes"
    # Per-shard base overrides written by delta folds: shard (str) ->
    # relative dir holding that shard's folded partition (`<dir>/shard=K`).
    # Shards absent here live under `base_rel`. A referenced override dir
    # can never be legitimately missing (folds always emit rows), so a
    # missing one means the reader's meta is stale — readers raise instead
    # of silently serving an empty shard.
    shard_base: dict[str, str] = field(default_factory=dict)
    # Committed delta generations of the base+delta node store, in commit
    # order (relative dirs; each holds only the rows its mutation changed).
    # Readers merge base + chain, latest generation wins per node_id.
    # Folded back into the base (and cleared) once the chain grows past the
    # fold threshold — Delta/Iceberg merge-on-read, so a micro-batch write
    # costs O(batch), not O(shard partition).
    delta_gens: list[str] = field(default_factory=list)
    # Monotonic, NEVER-reset numbering for delta dirs: a generation written
    # after a fold gets a fresh name, so it can't overwrite a superseded
    # dir an in-flight reader may still be merging (see trash_dirs).
    delta_counter: int = 0
    # Dirs superseded by the last fold/rebuild, retained for one
    # maintenance cycle so readers holding the previous meta still see a
    # complete consistent snapshot; the NEXT fold/rebuild sweeps them.
    trash_dirs: list[str] = field(default_factory=list)
    # Epoch at which `trash_dirs` was last (re)enqueued. Reader leases
    # (index_util.reader_lease) record the reader's meta epoch; the sweep
    # retains ALL trash while an unexpired lease predates this value — a
    # reader that acquired before the fold may still be merging these
    # dirs. 0 = unknown (pre-field metas): any live lease pins,
    # conservative. (Additive field: no version bump — old readers ignore
    # it, and the default reproduces their behavior.)
    trash_epoch: int = 0
    # Per-ENTRY enqueue epochs for `trash_dirs` (rel -> epoch of the meta
    # commit that dereferenced it), stamped automatically by save() on the
    # first commit that carries the entry. Lets the sweep pin ONLY trash a
    # live lease's snapshot could actually reference (lease epoch < entry
    # epoch) instead of retaining everything — a busy index with one
    # long-TTL reader keeps reclaiming trash enqueued before that reader
    # acquired. Entries absent here fall back to the global `trash_epoch`
    # (pre-field metas keep their exact old behavior). (Additive field:
    # no version bump.)
    trash_epochs: dict[str, int] = field(default_factory=dict)
    # IVF centroid-table location (relative). Rebuilds write a FRESH
    # generation dir and flip this pointer in the meta commit — the
    # centroid ids' meaning changes with the clustering, so a reader must
    # resolve centroids through ITS OWN meta snapshot, never a fixed path
    # a rebuild overwrites under it. Default = the legacy fixed dir, so
    # pre-pointer metas keep reading their existing layout. (Additive
    # field: no version bump — old readers ignore it, and its default
    # reproduces their behavior.)
    centroids_rel: str = "centroids"
    # ---- id -> partition routing sidecar (additive, no version bump:
    # defaults mean "absent" and absent degrades to the legacy corpus-scan
    # membership probe, the exact pre-field behavior) ----
    # Where an id LIVES is data under data-dependent sharding (kmeans
    # DiskANN shards, IVF cells), so mutation membership probes
    # ("which shard/cell holds this batch's ids?") would otherwise scan
    # the corpus-wide node_id column every micro-batch. The sidecar is a
    # tiny (node_id, part) parquet store hash-partitioned on
    # rb = pmod(xxhash64(node_id), routing_ids_buckets): probes prune to
    # the batch ids' rb partitions — O(corpus/buckets) IO per batch,
    # independent of cell count. Maintained as base + delta chain: inserts
    # append O(batch) rows (committed atomically by the same meta save as
    # the node delta), compaction merges the chain (routing_store.py).
    # The reference gets this free from the heap: aminsert/ambulkdelete
    # touch only affected pages (build.rs:537-558, vacuum.rs:23-136).
    routing_ids_rel: str | None = None
    routing_ids_deltas: list[str] = field(default_factory=list)
    routing_ids_buckets: int = 0
    # SBQ quantizer state (reference SbqMeans, sbq/mod.rs:79-86):
    # per-dimension mean and variance from the training pass.
    quantizer_means: list[float] = field(default_factory=list)
    quantizer_variances: list[float] = field(default_factory=list)
    # default + per-label start nodes (graph/start_nodes.rs:14-21)
    start_nodes: dict[str, int] = field(default_factory=dict)
    # Routing-recall curve measured at build time on kmeans shards
    # (additive field, no version bump: absent = no curve = recall_target
    # routing unavailable, the exact pre-field behavior). Maps
    # str(probe_shards) -> fraction of exact top-k neighbors (over a
    # deterministic query sample) whose home shard is among each query's
    # that-many nearest centroids — the ROUTING term of routed recall;
    # the graph term is gated separately by the full fan-out recall gates.
    # search(recall_target=r) picks the smallest probe count whose curve
    # value reaches r.
    routing_recall_curve: dict[str, float] = field(default_factory=dict)
    routing_recall_k: int = 0
    # Curve measurement provenance (additive fields, no version bump).
    # held_out records whether the curve was measured on held-out queries
    # (each sample query's own row excluded from its exact top-k): an
    # in-corpus query finds its neighborhood inside its own Voronoi cell
    # almost by construction, so an in-sample curve is optimistically
    # biased for the out-of-sample queries a real serving path sees —
    # pre-field metas default False and are treated as stale.
    # tuned_nodes stamps the live-row count the curve was measured at, so
    # maintenance (fold) can detect drift and re-tune instead of letting
    # recall_target probe selection run on a curve measured against a
    # different corpus. 0 = unstamped (pre-field meta) = stale.
    routing_recall_held_out: bool = False
    routing_tuned_nodes: int = 0

    @property
    def delta_seq(self) -> int:
        """Open delta-chain length (the V4 field, now derived): 0 = base
        only. Kept as a property so chain-length checks and the fold
        threshold read naturally."""
        return len(self.delta_gens)

    @property
    def effective_dims(self) -> int:
        return self.num_dimensions_to_index or self.num_dimensions

    @property
    def effective_bits(self) -> int:
        return self.bits_per_dimension or default_bits_per_dimension(
            self.effective_dims
        )

    def save(self, index_path: str) -> None:
        """Atomic commit: write to a unique temp file, then os.replace.
        The meta save IS the snapshot flip of the V5 store protocol, so a
        concurrent load must see the complete old or complete new meta —
        a plain truncate-and-write exposes readers to torn/empty JSON
        (caught by the concurrent-reader fold test)."""
        import uuid

        # stamp each trash entry with the epoch of the FIRST commit that
        # carries it (the commit that dereferenced the dir): a reader lease
        # can only reference trash whose stamp exceeds the lease's epoch,
        # which is exactly what sweep_trash's per-entry pin tests. Stamps
        # for entries a sweep already reclaimed are pruned.
        current = {rel: True for rel in self.trash_dirs}
        for rel in self.trash_dirs:
            self.trash_epochs.setdefault(rel, int(self.epoch))
        self.trash_epochs = {
            r: int(e) for r, e in self.trash_epochs.items() if r in current
        }

        os.makedirs(index_path, exist_ok=True)
        final = os.path.join(index_path, "_index_meta.json")
        tmp = os.path.join(index_path, f"_index_meta.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w") as f:
            json.dump(asdict(self), f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)

    @classmethod
    def load(cls, index_path: str) -> "IndexMeta":
        """Versioned read path (the reference migrates old meta-page formats
        on read, meta_page.rs:29-162, upgrade_test.rs:25-337): an old-format
        meta is migrated forward through the `_META_MIGRATIONS` chain before
        construction (a V1 index is readable by this V2 reader, and the next
        save() rewrites it in the current format), unknown fields from
        writers of a FUTURE minor revision are ignored, and a meta whose
        declared version is beyond this reader fails loudly instead of
        mis-reading."""
        import dataclasses

        with open(os.path.join(index_path, "_index_meta.json")) as f:
            raw = json.load(f)
        version = int(raw.get("version", 1))
        if version > CURRENT_META_VERSION:
            raise ValueError(
                f"index meta version {version} is newer than this reader "
                f"(supports <= {CURRENT_META_VERSION}); upgrade the library"
            )
        while version < CURRENT_META_VERSION:
            raw = _META_MIGRATIONS[version](raw)
            version = int(raw["version"])
        known = {fld.name for fld in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in raw.items() if k in known})
