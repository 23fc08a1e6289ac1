"""Render configuration.

The reference threads 13 positional bool/float toggles into ``pathtrace()``
(reference: src/pathtrace.h:8-21) driven by global key-toggled flags
(src/main.cpp:35-60). Here they live in one frozen dataclass which is
hashable, so it can be a static argument to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (compile-time) render options.

    Mirrors the reference's runtime toggles (src/main.cpp:35-60):

    - ``trace_depth``: max bounces. The reference caps at 8 regardless of
      scene DEPTH (pathtrace.cu:2608 ``depth > 7``); we honor the scene's
      value, capped by ``max_trace_depth``.
    - ``antialias``: jitter camera rays (key A; pathtrace.cu:336-362).
    - ``dof_angle`` / ``focal_length``: depth-of-field (keys -/= [/];
      pathtrace.cu:373-393).
    - ``softness``: soft-reflection cone (keys 1/2; interactions.h:259-266).
    - ``enable_sss``: subsurface scattering (key X; pathtrace.cu:2339-2346).
    - ``enable_kd``: use the KD tree instead of brute force (key K).
    - ``short_stack``: short-stack traversal variant (key L;
      pathtrace.cu:1023-1235) — here selects the stack-based vectorized
      traversal vs. the brute-force oracle.
    - ``use_bbox``: per-shape AABB cull in brute-force mode (key B;
      pathtrace.cu:497-507).
    - ``compaction``: terminated-ray compaction (key F; thrust::remove_if
      at pathtrace.cu:2591-2597) — on TPU implemented as a masked-lane
      wavefront plus optional sort; lanes are never dropped (static shapes).
    - ``material_sort``: sort paths by material id before shading (key M /
      iter==2 quirk at pathtrace.cu:2600-2606; here applied every bounce
      when enabled).
    - ``ray_cache``: reuse iteration-1 camera rays (key C;
      pathtrace.cu:2448-2456). Only meaningful when ``antialias`` is off
      (else every iteration would reuse the same jitter).
    """

    trace_depth: int = 8
    max_trace_depth: int = 8
    antialias: bool = False
    aa_jitter_scale: float = 0.002  # reference: pathtrace.cu:338
    dof_angle: float = 0.0
    focal_length: float = 8.0
    softness: float = 0.0
    enable_sss: bool = False
    enable_kd: bool = True
    # Traversal variant. On the reference GPU the short-stack walk wins
    # (README.md:146-162); on TPU v5e the measured winner is the
    # stackless skip-link walk (no per-lane stack scatter per step,
    # ~2.7x faster), so that is the default and short_stack=True is the
    # parity/experiment toggle.
    short_stack: bool = False
    # Horn-style push-down-restart variant of the short stack
    # (reference traverseKDshort, pathtrace.cu:1238-1414): a genuinely
    # SHORT fixed stack whose overflow drops are recovered by
    # restarting from a pushed-down root at [tmax, sceneMax]. Takes
    # effect with short_stack=True (and fat_rows=False, which has its
    # own tuned walks); ops/traverse.traverse_pushdown.
    push_down_restart: bool = False
    pushdown_stack: int = 6
    use_bbox: bool = True
    compaction: bool = False
    # Reference parity quirk: with compaction ON the reference gathers
    # per bounce via partialGather (pathtrace.cu:2386-2399), which adds
    # ONLY paths whose bounce budget hit zero — paths still alive after
    # the final bounce are silently dropped, visibly darkening closed
    # scenes (~20% of cornell paths survive 8 bounces). Here that
    # behavior is an explicit flag, decoupled from ``compaction`` (which
    # on TPU is a pure locality optimization with no image effect):
    # enable it to match reference renders made with compaction.
    partial_gather: bool = False
    material_sort: bool = False
    ray_cache: bool = False
    # Numerics
    dtype: str = "float32"
    # Traversal tuning
    stack_size: int = 24  # per-lane short-stack entries (depth<=~20 trees)
    leaf_chunk: int = 8  # triangles intersected per traversal step at a leaf
    max_traversal_steps: int = 4096  # safety bound for the while_loop
    # Fat-row traversal (ops/traverse.py): one packed row gather per step
    # — measured ~10x faster than the thin-SoA walk on TPU v5e, where
    # in-loop gather cost is per-op, not per-byte. False falls back to
    # the thin traversals (kept as correctness oracles).
    fat_rows: bool = True
    # Ray tiles per traversal: the while_loop cost is (per-tile max
    # steps) summed over tiles; coherent/miss tiles exit early. Tiles
    # are sized to at most ``tile_lanes`` rays each: ~10k lanes/tile
    # measured best on v5e — bigger tiles trip an XLA gather
    # pathology (89x blowup observed at 20k lanes x 88k-row table),
    # smaller ones pay per-tile dispatch overhead. ``traversal_tiles``
    # caps the tile COUNT (0 = uncapped), mainly for tests.
    tile_lanes: int = 10240
    # Ray lanes per tile when packet traversal is on: packets shrink the
    # per-step gather already, so bigger tiles (more packets per
    # while_loop step) amortize fixed per-step cost better; small tiles
    # starve the VPU. 0 disables tiling entirely for packets.
    packet_tile_lanes: int = 65536
    traversal_tiles: int = 0
    # Gather-steps per while-loop iteration in the skip-link walk: the
    # loop's fixed per-iteration cost is amortized over `unroll` steps
    # at the price of up to unroll-1 wasted steps per lane at exit.
    traversal_unroll: int = 4
    # Sort rays by a traversal-coherence key (direction octant + origin
    # morton, dead/miss lanes last) before tiling, so per-tile lockstep
    # maxima approach means. Pays one argsort + permutation per bounce.
    sort_rays: bool = True
    # Brute-force mode (enable_kd=False) via the det-form matmul
    # intersector (ops/mxu_bf.py): Moller-Trumbore recast as one
    # [N,10]x[10,4T] MXU matmul + VPU epilogue (Pallas-fused on TPU).
    # False falls back to the streaming VPU brute force (ops/mesh.py),
    # which also honors use_bbox per-shape culling.
    mxu_brute: bool = True
    # Packet traversal (ops/traverse._fatrow_packet_tile): rays grouped
    # into packets of `packet_size` consecutive coherence-sorted lanes
    # sharing ONE traversal cursor + short stack. Grounded in the
    # measured TPU cost model (exp/gather_micro.py): an in-loop row
    # gather costs a flat ~7 ns/lane regardless of width (pure issue
    # latency), so per-ray cursors pay 7 ns x steps/ray; packets cut the
    # gather to [n/P] lanes and turn AABB + inline Moller-Trumbore into
    # dense VPU broadcasts. Incoherent packets walk more nodes (the
    # packet visits the union of its lanes' subtrees) but never wrong
    # ones. 0 or 1 disables (per-ray fat-row walk).
    packet_size: int = 0
    # Use the per-direction-octant near-first tree layouts
    # (accel/kdtree.py OctantRows) for the stackless walk: short-stack-
    # quality t-pruning (near subtree always visited first) with zero
    # per-lane stack traffic. Costs 8x traversal-table memory; falls
    # back to the single fat-row layout when the table was not built
    # (see OCTANT_ROWS_MAX_ROWS — the gather cliff is on row count,
    # not bytes) or when short_stack is on.
    octant_rows: bool = True
    # Cluster-MXU intersector (ops/cluster.py): Morton triangle blocks
    # culled by matmul sphere bounds and intersected on the MXU —
    # replaces the per-ray KD walk (whose data-dependent gathers cost a
    # measured ~7 ns/lane/step on v5e; one gather buys ~500 MXU
    # ray-tri tests). Exact: a per-ray flag reruns any ray an
    # unselected block could still beat. Takes precedence over
    # ``enable_kd`` when the scene has a cluster table.
    cluster: bool = False
    # Auto-select the production intersector: when the scene has a
    # cluster table AND the mesh is at least ``cluster_min_tris``
    # triangles, the cluster family (variant picked by the
    # cluster_pairs/walk/binned flags — pairs by default) is used even
    # with ``cluster=False``. Below the threshold the KD walk wins
    # (fixed extraction/sort overheads dominate tiny meshes); the
    # threshold comes from the measured TPU sweep
    # (artifacts/SWEEP_r04_tpu.json, tools/benchmarks.py): pairs beat
    # every other mode at every measured size down to 1,280 tris, so
    # the threshold sits just below the smallest measured row. (The
    # reference documents the analogous crossover phenomenon at ~1.8k
    # verts for brute-vs-KD, README.md:215-220.) Set
    # ``cluster_auto=False`` to force the explicit flags only.
    cluster_auto: bool = True
    cluster_min_tris: int = 1024
    cluster_tile: int = 1024   # rays per tile (coherence order)
    # Max entry-ordered blocks walked per tile. The per-tile early exit
    # + copy-deduped round padding make unused rounds nearly free, so
    # this is a ceiling (sized so the exactness repair almost never
    # fires), not a cost knob.
    cluster_rounds: int = 64
    # Coherence-sort the wavefront (one multi-operand lax.sort) before
    # culling so each tile shares a small feasible-block union; rays
    # are unsorted on the way out. Costs 2 sorts/bounce, wins back
    # many rounds of matmul on incoherent bounce wavefronts.
    cluster_sort: bool = True
    # Binned cluster intersector (ops/binned.py): rays are counting-
    # sorted per bounce by their ARGMIN-ENTRY block id (one extra cull
    # pass computes it) instead of the octant+morton proxy key. Rays
    # whose nearest feasible block coincides walk nearly identical
    # entry-ordered lists, so tile unions collapse to a few blocks and
    # the early exit fires after ~the per-ray needed depth. Dead /
    # mesh-missing rays all land in one overflow bin whose tiles skip
    # every round. Takes precedence over plain ``cluster`` ordering
    # when set.
    cluster_binned: bool = False
    binned_rounds: int = 32   # entry-ordered ceiling per binned tile
    # Exact entry-ordered walk intersector (ops/walk.py): AABB slab
    # culls + per-tile while_loop over the FULL feasible list with
    # double-buffered weight DMA and a real early exit. No round
    # budget, no repair pass — exact by construction. Measured to
    # dominate both `cluster` and `cluster_binned` on incoherent
    # wavefronts (exp/bin_stats2.py). Takes precedence over both.
    cluster_walk: bool = False
    # Pair-list intersector (ops/pairs.py): per-ray top-F feasible
    # blocks become (ray, block) pairs, grouped mono-block per MXU
    # tile — work scales with the per-ray feasible count (~2.24 on
    # cornell+dragon) instead of the per-tile union (~66-300) that
    # caps every tile-shared design. Exact via the lb_over proof +
    # windowed second pass + exhaustive-walk tail. The production
    # default; takes precedence over all other cluster intersectors.
    cluster_pairs: bool = True
    # F: pairs per ray in pass 1. Measured fastest at 3 on the
    # cornell+dragon diffuse wave (exp/pairs_sweep.py: 98 ms vs 108 at
    # F=4, 128 at F=6) — the looped pass-2 window absorbs the extra
    # unproven rays more cheaply than every ray paying a 4th slot.
    pair_slots: int = 3
    pair_tile: int = 256   # pairs per mono-block MXU tile
    # Block-diagonal supertile kernel: one [ptile, 128] x [128, 4B] MXU
    # round covers up to 8 contiguous same-block runs (features placed
    # at lane offset 16*run-slot against a stacked weight matrix).
    # Bit-identical results (extra contraction terms are exact zeros)
    # but measured SLOWER than the runs kernel at dragon scale (13.6 vs
    # 10.3 ms): the matmul is bound by rows x output-tiles streaming,
    # not contraction depth (exp/bdiag_probe.py), so the 8x-deeper
    # contraction buys nothing and the f32 128-deep pass costs more.
    # Kept as a measured negative result / option.
    pair_bdiag: bool = False
    pair_bdiag_tile: int = 1024
    # Narrowing buffer = ns/pair_narrow_div (ptile-aligned): smaller
    # buffers fit the mesh-active population tighter (the while-loop
    # rounds scale with the REAL count, ~35% of a diffuse wave) at more
    # rounds. Swept on the dragon wave (r5): 60.6 / 52.0 / 43.4 ms full
    # call at div 2 / 4 / 8, flat beyond 8 — results bit-identical at
    # any div (rounds process disjoint ray sets).
    pair_narrow_div: int = 8
    # Shard-local binning: the ray axis is viewed as
    # [binned_shards, n/binned_shards] and the binning sort / repair
    # compaction run row-wise, so a ray-sharded GSPMD program (one row
    # per chip) emits NO cross-chip collectives in the intersector. Set
    # to the device count of the mesh; 1 = single chip.
    binned_shards: int = 1
    # Bounce loop form. lax.scan (True, default) compiles the bounce
    # body — including any Pallas kernels — ONCE instead of depth
    # times, cutting compile time ~8x on big scenes. The historical
    # lax.scan reverse-mode NaN that forced a Python-unroll default
    # disappeared with the r5 channel-split wavefront (the old [N, G]
    # masked-sum winner selection produced 0*inf cotangents in the scan
    # transpose); tests/test_grad.py::test_grad_scan_equals_unroll pins
    # scan-backward == unroll-backward. False keeps the unrolled form
    # (cross-bounce fusion; slower compiles).
    scan_bounces: bool = True

    def __post_init__(self):
        if self.trace_depth > self.max_trace_depth:
            object.__setattr__(self, "trace_depth", self.max_trace_depth)

    @property
    def effective_depth(self) -> int:
        return min(self.trace_depth, self.max_trace_depth)
