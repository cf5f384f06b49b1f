"""Pallas TPU rasterizer: the hot rendering kernel of the engine.

Same contract as `spriteworld_tpu.ops.rasterize.render_rgb` (itself a rebuild
of /root/reference/spriteworld/renderers/pil_renderer.py:66-91): paint sprite
polygons back-to-front on an `anti_aliasing`-supersampled canvas, box-average
down to `image_size`, flip vertically to math coordinates.

Three kernels cover the hardware's sweet spots (`kernel_mode`):

  * **Packed lane canvas** (aa=1, width < 128): the whole frame lives
    flattened as [h*w/128, 128] so every vreg lane is busy; statically
    unrolled, `pl.when`-predicated edge loops (`_fill_kernel`).
  * **Scene-per-program transposed canvas** (`_fill_kernel_scene`) — the
    AA>1 workhorse (the COBRA-canonical 64x64/AA=5 render): one program
    paints `group` whole scenes on a [wc, hc] VMEM canvas with image ROWS
    on lanes, consuming XLA-precomputed scanline tables through dynamic
    sublane/lane windows sized to each sprite's bounding box. See its
    docstring for the measured design rules (every structural choice here
    — one SMEM operand, no per-tile gating, streamed tables, lane tiling,
    compacted features — is worth multiple ms per 2048-scene batch on
    v5e; AA=5 went 74 ms -> 18 ms over the sequence).
  * **Row-strip grid** (`_fill_kernel`, multi-strip): bounded-VMEM
    fallback for supersampled canvases too large for one program.

Both fill modes of the XLA rasterizer are implemented:

  * `pil_exact=True`: Pillow's integer scanline fill in the sort-free
    per-pixel formulation (see ops/rasterize.py) — bit parity with the XLA
    path, hence with PIL at anti_aliasing=1.
  * `pil_exact=False`: even-odd crossing test at pixel centers (~2x
    cheaper; at anti_aliasing>1 the subpixel differences vanish into the
    box average — the tolerance class the reference's own AA tests accept,
    tests/renderers/pil_renderer_test.py:68-72).

All shapes are static at trace time. `render_rgb_batch(factors[B, K, 10],
num_sprites[B])` is the fast path; the unbatched `render_rgb` wraps it and
also supports vmap.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spriteworld_tpu import constants
from spriteworld_tpu.core import state as state_lib
from spriteworld_tpu.ops import geometry
from spriteworld_tpu.ops import resample

_COUNTS_HOST = constants.VERTEX_COUNTS
_BIG = 1e9



# Edge-table field indices (packed [..., V, NE]; the kernel reads fields as
# scalar SMEM loads at static addresses).
_E_Y0, _E_Y1, _E_X0, _E_M, _E_SLANT, _E_YMIN, _E_YMAX, _E_HORIZ, \
    _E_HLO, _E_HHI = range(10)
_NE = 10

# Wedge-table fields (pil_exact only; per polygon vertex).
_W_ROW, _W_LO, _W_HI, _W_ACTIVE = range(4)
_NW = 4


def _round_half_up(f):
    """Pillow ROUND_UP: round half away from zero (positive domain)."""
    return jnp.floor(f + 0.5)


def _build_edge_tables(verts_c, counts, pil_exact: bool):
    """Per-edge constants [K, V, _NE], wedge table [K, V, _NW], gymax [K].

    verts_c: f32[K, V, 2] canvas-space vertices (padding repeats vertex 0,
    so padded edges are degenerate and never straddle a scanline). Padded
    edges get neutral fields (slant=horiz=0, inverted y-range) so loops may
    safely overrun into padding.
    """
    v = jnp.trunc(verts_c) if pil_exact else verts_c
    vmax = v.shape[-2]
    idx = jnp.arange(vmax)
    x0, y0 = v[..., 0], v[..., 1]
    x1 = jnp.roll(x0, -1, axis=-1)
    y1 = jnp.roll(y0, -1, axis=-1)
    valid = (idx[None, :] < counts[:, None])
    horiz = (y0 == y1) & valid
    slant = (y0 != y1) & valid

    dy = jnp.where(y1 == y0, 1.0, y1 - y0)
    m = (x1 - x0) / dy
    ymin_e = jnp.minimum(y0, y1)
    ymax_e = jnp.maximum(y0, y1)
    gymax = jnp.max(jnp.where(valid, ymax_e, -_BIG), axis=-1)  # [K]

    edges = jnp.stack([
        y0,
        # Invalid edges (incl. all edges of dead slots) get y1 := y0 so the
        # centroid straddle test is degenerate without extra masking.
        jnp.where(valid, y1, y0),
        x0, m,
        slant.astype(jnp.float32),
        jnp.where(slant, ymin_e, _BIG),
        jnp.where(slant, ymax_e, -_BIG),
        horiz.astype(jnp.float32),
        jnp.minimum(x0, x1), jnp.maximum(x0, x1),
    ], axis=-1)  # [K, V, _NE]

    if not pil_exact:
        return edges, jnp.zeros(edges.shape[:-2] + (vmax, _NW),
                                jnp.float32), gymax

    # Wedge extensions at one-sided top vertices / global-bottom vertices
    # (pure per-vertex geometry -> precomputed; kernel only row-matches).
    # The indexed neighbor reads go through one-hot contractions: TPU lowers
    # tiny dynamic gathers catastrophically (take_along_axis here cost 83ms
    # per 2048-scene batch — half the whole AA=5 render; one-hot is ~free).
    def neighbor(direction):
        """Nearest distinct cyclic neighbor within 3 steps, gather-free.

        The cyclic access x0[(i + direction*step) mod count] is a static
        roll plus a wrap fix-up: forward, valid edges can only overrun the
        count boundary by step-1 <= 2 positions, which are the STATIC
        vertices 0..2; backward, the underrun positions are count-1-t for
        t in 0..2, each a single masked reduction. This replaces the
        per-step [K, V, V] one-hot einsums (12 per prepare; a dynamic
        gather here measured 83 ms per 2048-scene batch, and the one-hot
        dots still paid operand materialization).
        """
        nx = jnp.zeros_like(x0)
        ny = jnp.zeros_like(y0)
        found = jnp.zeros_like(x0, dtype=bool)
        if direction < 0:
            wrap = [
                (jnp.sum(jnp.where(idx[None, :] == counts[:, None] - 1 - t,
                                   x0, 0.0), -1, keepdims=True),
                 jnp.sum(jnp.where(idx[None, :] == counts[:, None] - 1 - t,
                                   y0, 0.0), -1, keepdims=True))
                for t in range(3)]
        for step in (1, 2, 3):
            cx = jnp.roll(x0, -direction * step, axis=-1)
            cy = jnp.roll(y0, -direction * step, axis=-1)
            if direction > 0:
                # i < count implies i + step - count <= step - 1 <= 2.
                over = idx[None, :] + step - counts[:, None]
                for t in range(3):
                    sel = over == t
                    cx = jnp.where(sel, x0[:, t:t + 1], cx)
                    cy = jnp.where(sel, y0[:, t:t + 1], cy)
            else:
                under = idx[None, :] - step
                for t in range(3):
                    sel = under == -(t + 1)
                    cx = jnp.where(sel, wrap[t][0], cx)
                    cy = jnp.where(sel, wrap[t][1], cy)
            differs = (cx != x0) | (cy != y0)
            take = (~found) & differs
            nx = jnp.where(take, cx, nx)
            ny = jnp.where(take, cy, ny)
            found |= differs
        return nx, ny, found

    px, py, pf = neighbor(-1)
    nx, ny, nf = neighbor(+1)
    vx, vy = x0, y0
    gy = gymax[:, None]
    ok = valid & pf & nf & (py != vy) & (ny != vy)
    is_top = ok & (py > vy) & (ny > vy)
    is_gbot = ok & (py < vy) & (ny < vy) & (vy == gy)
    adj = jnp.where(is_top, vy + 1.0, vy - 1.0)
    u1 = vx + (adj - vy) * (px - vx) / jnp.where(py == vy, 1.0, py - vy)
    u2 = vx + (adj - vy) * (nx - vx) / jnp.where(ny == vy, 1.0, ny - vy)
    active = is_top | is_gbot
    right_side = active & (u1 > vx) & (u2 > vx)
    left_side = active & (u1 < vx) & (u2 < vx)
    min_u = jnp.minimum(u1, u2)
    max_u = jnp.maximum(u1, u2)
    lo = jnp.where(right_side, vx,
                   jnp.where(left_side, _round_half_up(max_u) + 1.0, _BIG))
    hi = jnp.where(right_side, _round_half_up(min_u) - 1.0,
                   jnp.where(left_side, vx, -_BIG))
    wactive = right_side | left_side
    wedges = jnp.stack(
        [jnp.where(wactive, vy, -_BIG), lo, hi,
         wactive.astype(jnp.float32)], axis=-1)  # [K, V, _NW]
    return edges, wedges, gymax


# Scalar-field indices in the packed scene table (compacted feature
# triplets follow the scalars).
_TS_COUNT, _TS_NF, _TS_COLOR, _TS_GYMAX, \
    _TS_B0, _TS_B1, _TS_B2, _TS_B3, _TS_FAST = range(9)
_NS = 9

# Sublane rows of the edge-field block [_NEF, K*Vp] (sprite x vertex
# flattened on lanes): the kernel transposes each row to a [K*Vp, 1]
# column (free — a vector reshape) to build the scanline tables for ALL
# sprites' edges in one pass. _EF_GYMAX carries the sprite's global
# bottom row, replicated per vertex, so the batched pass needs no
# per-sprite scalar.
_EF_Y0, _EF_M, _EF_X0, _EF_YMIN, _EF_YMAX, _EF_Y1, _EF_GYMAX = range(7)
_NEF = 8  # padded to a full sublane tile


def _scene_fastok(edges, gymax, hc: int, pil_exact: bool):
    """bool[B, K]: may the scene kernel use the single-interval fill?

    Decides, PER SPRITE, whether on every scanline the (trimmed) crossing
    multiset collapses to at most two distinct positions a <= b with the
    weight at each extreme odd (or one position, or none) — exactly the
    rows where the parity+window fill equals ``a < col+0.5 and
    b > col-0.5`` (see the scene kernel). Convex shapes qualify on every
    row; stars/spokes don't.

    For the exact fill this is decided GEOMETRICALLY in edge space
    ([B, K, V] tensors — a per-row recomputation of the kernel's crossing
    tables would materialize [B, K, V, hc] at the FMA barrier, measured
    ~4 ms/2048 scenes of pure bandwidth):

      1. the slant edges form at most two y-monotone chains (cyclic
         direction-change count 0 or 2, next-slant found within 3 steps);
      2. at every chain vertex the ending edge's kernel-arithmetic
         crossing reproduces the vertex x EXACTLY (f32 mul-then-add with
         an optimization_barrier so XLA cannot contract it into an FMA —
         Mosaic never does), so the two in-range edges of a vertex row
         contribute ONE position, and
      3. horizontal edges sit only on the global extreme rows (interior
         flats create even-weight positions the interval test cannot
         represent).

    Under 1-3 every row's multiset is one of {}, {c(w)}, or
    {a(odd), b(odd)} after Pillow's odd-total trim — the shapes the
    interval formula reproduces bit-exactly (see the kernel docstring;
    tests/test_rasterize_pallas.py's adversarial fuzz proves it by
    asserting bit-equality against the same kernel with this predicate
    forced all-False). The fast fill's predicate is per-row straddle
    counting — with
    centroid sampling there are no closed-interval/trim subtleties, and
    XLA fuses the [B, K, V, hc] reduction without materializing it.
    """
    if pil_exact:
        slant = edges[..., _E_SLANT] > 0.0           # [B, K, V]
        horiz = edges[..., _E_HORIZ] > 0.0
        y0 = edges[..., _E_Y0]
        y1 = edges[..., _E_Y1]
        m = edges[..., _E_M]
        x0 = edges[..., _E_X0]
        x1 = edges[..., _E_HLO] + edges[..., _E_HHI] - x0  # exact ints
        v = y0.shape[-1]
        valid = slant | horiz
        counts = valid.sum(axis=-1)                  # [B, K]

        # 2. Vertex-crossing round-trip: the kernel evaluates the edge at
        # its FAR row y1 as x0 + (y1 - y0) * m (mul, then add; barriered
        # against FMA contraction to match Mosaic); it must land exactly
        # on the integer endpoint x1 or two in-range edges of one vertex
        # would contribute ulp-distinct positions.
        xi1 = x0 + jax.lax.optimization_barrier((y1 - y0) * m)
        vertex_ok = jnp.all(~slant | (xi1 == x1), axis=-1)

        # 1. Chain structure: direction sign per slant edge; the cyclic
        # successor slant edge within 3 steps (same bounded one-hot walk
        # as _build_edge_tables' neighbor search — TPU lowers tiny dynamic
        # gathers catastrophically).
        dirs = jnp.sign(y1 - y0)
        idx = jnp.arange(v)
        nxt_dir = jnp.zeros_like(dirs)
        nxt_found = jnp.zeros_like(slant)
        # Gather-free cyclic walk: roll + static wrap fix-up (valid edges
        # overrun the count boundary by at most step-1 <= 2 positions,
        # which are the static indices 0..2) — same trick as the
        # _build_edge_tables neighbor search.
        for step in (1, 2, 3):
            c_dir = jnp.roll(dirs, -step, axis=-1)
            c_slant = jnp.roll(slant, -step, axis=-1)
            over = idx + step - counts[..., None].astype(idx.dtype)
            for t in range(3):
                sel = over == t
                c_dir = jnp.where(sel, dirs[..., t:t + 1], c_dir)
                c_slant = jnp.where(sel, slant[..., t:t + 1], c_slant)
            take = (~nxt_found) & c_slant
            nxt_dir = jnp.where(take, c_dir, nxt_dir)
            nxt_found |= c_slant
        changes = (slant & nxt_found
                   & (dirs != nxt_dir)).sum(axis=-1)  # [B, K]
        nslant = slant.sum(axis=-1)
        chain_ok = ((nslant == 0) | (changes == 2)) \
            & jnp.all(~slant | nxt_found, axis=-1)

        # 3. Horizontal edges only on the global extreme rows.
        ymin_all = jnp.min(jnp.where(valid, jnp.minimum(y0, y1), _BIG),
                           axis=-1)
        horiz_ok = jnp.all(
            ~horiz | (y0 == ymin_all[..., None])
            | (y0 == gymax[..., None]), axis=-1)

        return vertex_ok & chain_ok & horiz_ok
    rows = jnp.arange(hc, dtype=jnp.float32) + 0.5
    y0 = edges[..., _E_Y0][..., None]        # [B, K, V, 1]
    y1 = edges[..., _E_Y1][..., None]
    straddle = (y0 > rows) != (y1 > rows)
    cnt = straddle.astype(jnp.float32).sum(axis=-2)  # [B, K, hc]
    rowok = (cnt == 0.0) | (cnt == 2.0)
    return jnp.all(rowok, axis=-1)           # [B, K]


def _fill_kernel_scene(*refs,
                       num_slots: int, max_vertices: int,
                       hc: int, wc: int, h: int, w: int,
                       pil_exact: bool, bg_packed: float, lanczos: bool,
                       cspan: int, group: int, interpret: bool,
                       identity_ds: bool = False):
    """One program = `group` whole scenes, on a TRANSPOSED canvas (AA>1).

    Layout is the heart of this kernel: the packed-RGB canvas lives in VMEM
    as [wc, hc] — image ROWS on the lane dimension, COLUMNS on sublanes.

      * Scanline quantities (crossing positions, weights, row totals) are
        per-row — as [1, hc] lane vectors they broadcast across sublanes
        for free, so the per-edge wide work is ~4 ops on the window.
      * Each sprite paints ONE dynamically-addressed sublane window
        `canvas[pl.ds(cstart, cspan), :]` around its column bounding box —
        no per-tile `pl.when` gating at all. The strip/chunk grids needed
        ~150-390k predicated tile gates per 2048-scene batch; measured on
        v5e those gates alone cost ~25-30 ms. Dead sprites and off-canvas
        windows degrade to zero-trip `fori_loop`s (branchless skip).
      * ALL per-scene tables arrive as ONE packed SMEM operand. Separate
        SMEM inputs cost one blocking DMA each at program start (measured:
        8 scalar operands ~= 19 us/program of pure latency); one table is
        one DMA, and `group` scenes per program amortize it further.
      * Both downsample passes run in-kernel on the MXU in transposed
        space (h-pass: [w, wc] @ [wc, hc]; v-pass: [w, hc] @ [hc, h], the
        vertical matrix carrying the flip), so no supersampled intermediate
        ever leaves the core. The caller un-transposes the [B, 3, w, h]
        result once in XLA.

    The exact fill's hot loop touches NO memory beyond its own carries: the
    per-edge scanline tables (crossing position xi and Pillow instance
    weight) are built IN-KERNEL, vectorized over all edges at once, from a
    tiny per-sprite field block ([8, Vp]: each field row transposes to a
    [Vp, 1] column for free) into VMEM scratch — streaming precomputed
    [Vp, hc] tables from XLA cost ~3 ms/2048 scenes in build + HBM traffic.
    The hot loop reads tile-aligned [8, 128] slabs from scratch, so each
    live edge costs two register rows + four wide ops — measured, the
    SMEM-scalar-load formulation paid ~190 cycles per edge in address math
    and load latency alone. Pillow's rare horizontal-edge/wedge features
    arrive pre-compacted as (row, lo, hi) integer intervals, so a sprite
    pays per ACTIVE feature (usually 0-3), not per vertex.
    """
    if pil_exact:
        (tab_ref, ef_ref, *mat_refs, out_ref, canvas_ref, xscr_ref,
         wscr_ref, ab_ref) = refs
    else:
        (tab_ref, ef_ref, *mat_refs, out_ref, canvas_ref, xscr_ref,
         ab_ref) = refs
        wscr_ref = None
    vp = ef_ref.shape[2] // num_slots
    half = 0.0 if pil_exact else 0.5
    # Row (lane) dim: `hcl` is the logical canvas width padded to a
    # 128-lane multiple. `twidth` is the lane width of one fill tile.
    # (Negative result, measured on v5e: allocating scratch 128 lanes
    # wider and filling one [span, 256] window per sprite instead of 1-2
    # [span, 128] tiles cost ~0.8 ms/2048 scenes at 64x64/AA=5 — a wide
    # dynamic access is as expensive as two narrow ones, and the extra
    # lanes of vector work are pure loss.)
    hcl = canvas_ref.shape[1]
    twidth = 128

    def scene_body(g, _):
        def S(k, i):
            return tab_ref[g, k, i]

        def F(k, j, c):
            return tab_ref[g, k, _NS + j * 3 + c]

        canvas_ref[:, 0:hcl] = jnp.full((wc, hcl), bg_packed,
                                        jnp.float32)
        rows_f = jax.lax.broadcasted_iota(
            jnp.int32, (1, hcl), 1).astype(jnp.float32) + half

        # Scanline tables for ALL edges at once, for ALL sprites in ONE
        # branch-free elementwise pass (phase 1): the per-sprite [8, Vp]
        # field blocks arrive host-stacked as [_NEF, K*Vp], so xi and the
        # RAW Pillow instance weights for every (sprite, edge) pair build
        # on a single [K*Vp, hcl] slab — the six formerly separate
        # per-sprite build streams (each latency-bound on tiny vectors)
        # collapse into one wide, ILP-friendly block. Dead sprites have
        # neutral fields and simply produce zero-weight rows.
        #
        # Phase 2 (per sprite, just before its fill) applies Pillow's
        # odd-total trim (drop one instance of the row maximum on odd
        # rows; first-max via iota/min-reduce) to the sprite's static
        # slab and derives the single-interval fast-path bounds: per row,
        # when the (trimmed) crossings sit at at most TWO distinct
        # positions a <= b, the exact parity+window rule collapses to one
        # interval test  fill(col) <=> a < col+0.5 and b > col-0.5.
        # Convex polygons — every COBRA workload shape, including the
        # 30-gon circle — qualify on every row; stars/spokes fail the
        # check on their multi-span rows and keep the per-edge loop. The
        # flag itself is decided in XLA (_scene_fastok) and rides the
        # SMEM table: an in-kernel vector->scalar reduction here measured
        # ~3 ms/2048 scenes of pipeline-stall latency.
        kvp = num_slots * vp

        def build_phase1(g=g):
            fb = ef_ref[g]  # [_NEF, K*Vp]

            def col(fi):
                return fb[fi:fi + 1, :].reshape(kvp, 1)

            y0c, mc, x0c = col(_EF_Y0), col(_EF_M), col(_EF_X0)
            # The interpreter path is XLA-CPU-compiled, where an FMA's
            # single rounding would diverge from ops/rasterize.py's
            # mul-then-add f32 xi by 1 ulp — enough to flip
            # crossing-vs-boundary compares; barrier the product.
            # Mosaic does no FMA contraction (and can't lower the
            # barrier), so the compiled TPU kernel skips it.
            prod = (rows_f - y0c) * mc
            if interpret:
                prod = jax.lax.optimization_barrier(prod)
            xi_full = x0c + prod  # [K*Vp, hcl]
            if pil_exact:
                xscr_ref[:, 0:hcl] = xi_full
                ymn, ymx = col(_EF_YMIN), col(_EF_YMAX)
                inr = (rows_f >= ymn) & (rows_f <= ymx)
                dup = inr & (rows_f == ymx) & (ymx < col(_EF_GYMAX))
                wscr_ref[:, 0:hcl] = (inr.astype(jnp.float32)
                                      + dup.astype(jnp.float32))
            else:
                straddle = (y0c > rows_f) != (col(_EF_Y1) > rows_f)
                xscr_ref[:, 0:hcl] = jnp.where(straddle, xi_full, -_BIG)

        def build_phase2(k, g=g):
            sl = slice(k * vp, (k + 1) * vp)
            xs = xscr_ref[sl, 0:hcl]
            if pil_exact:
                wgt_raw = wscr_ref[sl, 0:hcl]
                tot = jnp.sum(wgt_raw, axis=0, keepdims=True)
                odd = jnp.mod(tot, 2.0) == 1.0
                rmax = jnp.max(jnp.where(wgt_raw > 0, xs, -_BIG),
                               axis=0, keepdims=True)
                ismax = (wgt_raw > 0) & (xs == rmax)
                vio = jax.lax.broadcasted_iota(jnp.int32, (vp, hcl), 0)
                fidx = jnp.min(jnp.where(ismax, vio, vp), axis=0,
                               keepdims=True)
                first = vio == fidx
                wgt = wgt_raw - (odd & ismax & first).astype(jnp.float32)
                wscr_ref[sl, 0:hcl] = wgt
                posw = wgt > 0.0
                a_row = jnp.min(jnp.where(posw, xs, _BIG), axis=0,
                                keepdims=True)
                b_row = jnp.max(jnp.where(posw, xs, -_BIG), axis=0,
                                keepdims=True)
            else:
                straddle = xs > -_BIG * 0.5
                a_row = jnp.min(jnp.where(straddle, xs, _BIG), axis=0,
                                keepdims=True)
                b_row = jnp.max(xs, axis=0, keepdims=True)
            ab_ref[0:1, 0:hcl] = a_row
            ab_ref[1:2, 0:hcl] = b_row

        # Single-tile canvases (the whole frame is one [wc, 128] block —
        # the anti_aliasing=1 case) take a fully static fill: no window /
        # lane-tile fori machinery, no dynamic canvas addressing. Measured
        # on v5e the dynamic-loop scaffolding (trip-count math, dynamic
        # sublane/lane offsets, loop carries) dominated the tiny per-tile
        # vector work at 64x64/aa=1.
        single_tile = hcl == 128 and wc <= cspan

        def tile_fill(span, cstart, lstart, cols, colsm, colsp,
                      k, count, sound):
            """Fill one [span, 128] canvas tile for sprite k.

            `span` is static; `cstart`/`lstart` may be 0 (static) or
            8/128-aligned dynamic offsets.
            """
            rows_t = (lstart + jax.lax.broadcasted_iota(
                jnp.int32, (1, twidth), 1)).astype(jnp.float32) + half
            ab2 = ab_ref[0:2, pl.ds(lstart, twidth)]  # one dyn read
            af = ab2[0:1, :]
            bf = ab2[1:2, :]
            # Single-interval sprites (all convex shapes; all-rows-ok
            # scalar from the build pass) skip the per-edge loop
            # entirely: the whole fill is two compares against the
            # per-row interval bounds — ~10x fewer tile ops for a
            # 30-gon circle. The zero-trip fori leaves the slow mask
            # empty, so the OR below is the fast mask alone.
            nchunk = jnp.where(sound > 0.0, 0, pl.cdiv(count, 8))
            if pil_exact:
                # One accumulator holds both counts: acc = 1025*le + win
                # (both <= ~60, exact in f32) — halves the big fori
                # carries. Edges are consumed 8 at a time: the loop
                # reads one tile-aligned [8, 128] slab per trip (the
                # pl.ds offsets are provably sublane/lane multiples)
                # and unrolls the 8 rows statically — measured ~4x
                # cheaper than per-edge dynamic single-row reads, and
                # padded rows are weight-0 neutral. The odd-total trim
                # is baked into the weight scratch (above), so the
                # fill decision is the plain parity/window rule.
                def chunk(c8, carry):
                    base = pl.multiple_of(k * vp + c8 * 8, 8)
                    xis = xscr_ref[pl.ds(base, 8), pl.ds(lstart, twidth)]
                    wgs = wscr_ref[pl.ds(base, 8), pl.ds(lstart, twidth)]
                    wgs1025 = wgs * 1025.0
                    for i in range(8):
                        xi = xis[i:i + 1, :]
                        # Nested selects: an le-edge contributes 1025w
                        # (le subset-of bc, so it is in both counts),
                        # a window-only edge w — one add per edge
                        # instead of two, and select(cmp, wgt, 0) is
                        # one VPU op vs the two of wgt * cmp.f32. The
                        # 1025 packing decodes exactly below via the
                        # power-of-two 2^-10 multiply.
                        carry = carry + jnp.where(
                            xi <= colsm, wgs1025[i:i + 1, :],
                            jnp.where(xi < colsp,
                                      wgs[i:i + 1, :], 0.0))
                    return carry

                acc = jax.lax.fori_loop(
                    0, nchunk, chunk,
                    jnp.zeros((span, twidth), jnp.float32))
                le = jnp.floor(acc * (1.0 / 1024.0))
                win = acc - le * 1025.0  # bc - le
                fastm = (sound > 0.0) & (af < colsp) & (bf > colsm)
                mask = ((jnp.mod(le, 2.0) == 1.0)
                        | (win > 0) | fastm).astype(jnp.int32)

                # Compacted features: integer intervals on single rows.
                nf = S(k, _TS_NF).astype(jnp.int32)

                def fbody(j, acc_):
                    frow = F(k, j, 0)
                    flo = F(k, j, 1)
                    fhi = F(k, j, 2)
                    return acc_ | ((rows_t == frow)
                                   & (cols >= flo)
                                   & (cols <= fhi)).astype(jnp.int32)

                mask = jax.lax.fori_loop(0, nf, fbody, mask)
            else:
                def cchunk(c8, acc):
                    base = pl.multiple_of(k * vp + c8 * 8, 8)
                    xis = xscr_ref[pl.ds(base, 8), pl.ds(lstart, twidth)]
                    for i in range(8):
                        acc = acc ^ (
                            cols < xis[i:i + 1, :]).astype(jnp.int32)
                    return acc

                mask = jax.lax.fori_loop(
                    0, nchunk, cchunk,
                    jnp.zeros((span, twidth), jnp.int32))
                mask = mask | ((sound > 0.0) & (cols >= af)
                               & (cols < bf)).astype(jnp.int32)

            # Masked store: no canvas read-modify-write. With straight-line
            # first-tile fills this measured -0.26 ms/2048 scenes at
            # 64x64/AA=5 on v5e vs the read-select-write form.
            pltpu.store(
                canvas_ref.at[pl.ds(cstart, span), pl.ds(lstart, twidth)],
                jnp.full((span, twidth), S(k, _TS_COLOR), jnp.float32),
                mask=mask > 0)

        def fill(k, g=g):
            count = S(k, _TS_COUNT).astype(jnp.int32)
            # The fast-path flag is decided in XLA with IDENTICAL float
            # arithmetic (see _scene_fastok) and rides the SMEM table, so
            # reading it costs the same as `count` — the in-kernel
            # vector->scalar reduction it replaces measured ~3 ms/2048
            # scenes of pipeline-stall latency.
            sound = S(k, _TS_FAST)
            if single_tile:
                cols = jax.lax.broadcasted_iota(
                    jnp.int32, (wc, 1), 0).astype(jnp.float32) + half

                @pl.when(count > 0)
                def _one(k=k, count=count, sound=sound):
                    tile_fill(wc, 0, 0, cols, cols - 0.5, cols + 0.5,
                              k, count, sound)
                return
            # Column window (sublane dim): bbox clamped, aligned down to 8.
            clo = jnp.clip(S(k, _TS_B2).astype(jnp.int32), 0, wc - 1)
            chi = jnp.clip(S(k, _TS_B3).astype(jnp.int32), 0, wc - 1)
            clo8 = (clo // 8) * 8
            nwin = pl.cdiv(chi - clo8 + 1, cspan)
            # Row tiles (lane dim, 128 wide): only the 1-2 tiles the
            # sprite's row bbox touches — wide ops shrink from
            # [cspan, hcp] to [cspan, 128].
            rlo = jnp.clip(S(k, _TS_B0).astype(jnp.int32), 0, hc - 1)
            rhi = jnp.clip(S(k, _TS_B1).astype(jnp.int32), 0, hc - 1)
            lt0 = (rlo // 128) * 128
            nlt = (rhi - lt0) // twidth + 1

            # Straight-line first (window, tile) — the only one most
            # sprites have — plus rarely-entered guarded loops for the
            # rest. (The former nested window x lane-tile fori pair paid
            # its setup even in the 1-window/1-tile common case.)
            cstart0 = pl.multiple_of(
                jnp.minimum(clo8, wc - cspan), 8)
            cols0 = (cstart0 + jax.lax.broadcasted_iota(
                jnp.int32, (cspan, 1), 0)).astype(jnp.float32) + half
            lt0m = pl.multiple_of(lt0, 128)

            @pl.when(count > 0)
            def _t0(k=k, count=count, sound=sound):
                tile_fill(cspan, cstart0, lt0m, cols0,
                          cols0 - 0.5, cols0 + 0.5, k, count, sound)

            @pl.when((count > 0) & (nlt > 1))
            def _t0rest(k=k, count=count, sound=sound, nlt=nlt,
                        lt0=lt0):
                def lt_body(li, ___):
                    lstart = pl.multiple_of(lt0 + li * twidth, 128)
                    tile_fill(cspan, cstart0, lstart, cols0,
                              cols0 - 0.5, cols0 + 0.5,
                              k, count, sound)
                    return 0

                jax.lax.fori_loop(1, nlt, lt_body, 0)

            @pl.when((count > 0) & (nwin > 1))
            def _wrest(k=k, count=count, sound=sound, nlt=nlt,
                       lt0=lt0, clo8=clo8, nwin=nwin):
                def win_body(wi, __):
                    cstart = pl.multiple_of(
                        jnp.minimum(clo8 + wi * cspan, wc - cspan), 8)
                    cols = (cstart + jax.lax.broadcasted_iota(
                        jnp.int32, (cspan, 1), 0)
                    ).astype(jnp.float32) + half

                    def lt_body(li, ___):
                        lstart = pl.multiple_of(lt0 + li * twidth, 128)
                        tile_fill(cspan, cstart, lstart, cols,
                                  cols - 0.5, cols + 0.5,
                                  k, count, sound)
                        return 0

                    jax.lax.fori_loop(0, nlt, lt_body, 0)
                    return 0

                jax.lax.fori_loop(1, nwin, win_body, 0)

        build_phase1()
        for k in range(num_slots):
            build_phase2(k)
            fill(k)

        # Unpack packed-RGB exactly (integers <= 2^24, power-of-two
        # divisors) and downsample both axes on the MXU, transposed space.
        p = canvas_ref[:, 0:hcl]

        _dims = (((1,), (0,)), ((), ()))

        def unpack(c):
            if c == 0:
                return jnp.floor(p * (1.0 / 65536.0))
            if c == 1:
                return (jnp.floor(p * (1.0 / 256.0))
                        - jnp.floor(p * (1.0 / 65536.0)) * 256.0)
            return p - jnp.floor(p * (1.0 / 256.0)) * 256.0

        def store(c, o):
            # u8 store: 4x less output traffic than f32 + cheap epilogue.
            # (f32->u8 isn't a supported Mosaic cast; hop through int32.)
            out_ref[g, c] = jnp.clip(o, 0.0, 255.0).astype(
                jnp.int32).astype(jnp.uint8)

        if lanczos:
            # Split-tap exact bf16 downsample (tap = hi + lo, both operands
            # of every dot bf16-exact; residual ~2^-18 relative — far
            # inside the 0.5 PIL rounding margin), laid out for MXU
            # utilization: the h-pass taps arrive HOST-stacked as
            # [hi; lo] = [2w, wc], so one M=128-full pass per channel
            # replaces two half-idle M=64 passes; the v-pass stacks all
            # three channels' h-results into [3w, hcp] so its two tap
            # passes run at M=192 instead of six M=64/N=64 quarter-idle
            # dots. Arithmetic is bit-identical to the per-channel
            # split_dot it replaces (M-rows of a matmul are independent).
            rt2_ref, lthi_ref, ltlo_ref = mat_refs
            rt2 = rt2_ref[...]
            ts = []
            for c in range(3):
                oh = jax.lax.dot_general(
                    rt2, unpack(c).astype(jnp.bfloat16), _dims,
                    preferred_element_type=jnp.float32)   # [2w, hcp]
                t = oh[0:w, :] + oh[w:2 * w, :]
                ts.append(jnp.clip(jnp.floor(t + 0.5), 0.0, 255.0))
            t3 = jnp.concatenate(ts, axis=0).astype(jnp.bfloat16)
            o3 = jax.lax.dot_general(
                t3, lthi_ref[...], _dims,
                preferred_element_type=jnp.float32) \
                + jax.lax.dot_general(
                    t3, ltlo_ref[...], _dims,
                    preferred_element_type=jnp.float32)   # [3w, h]
            o3 = jnp.clip(jnp.floor(o3 + 0.5), 0.0, 255.0)
            for c in range(3):
                store(c, o3[c * w:(c + 1) * w, :])
            return 0

        if identity_ds:
            # anti_aliasing=1: both box matrices are identities (R exactly;
            # L an identity plus the vertical flip), so the downsample
            # matmuls are pure data movement — skip them and store the
            # canvas directly. The flip moves into the caller's final XLA
            # relayout (it fuses with the output transpose), bit-identical
            # to the HIGHEST-precision identity matmuls it replaces.
            for c in range(3):
                store(c, unpack(c)[:, 0:h])
            return 0

        rt_ref, lt_ref = mat_refs
        rt = rt_ref[...]
        lt = lt_ref[...]
        for c in range(3):
            ch = unpack(c)
            if pil_exact:
                # Box average in full f32 (rare mode; keeps legacy parity).
                t = jax.lax.dot_general(
                    rt, ch, _dims,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
                o = jax.lax.dot_general(
                    t, lt, _dims,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
            else:
                # Fast mode: single-pass bf16 (no exactness claim).
                t = jax.lax.dot_general(
                    rt.astype(jnp.bfloat16), ch.astype(jnp.bfloat16),
                    _dims, preferred_element_type=jnp.float32)
                o = jax.lax.dot_general(
                    t.astype(jnp.bfloat16), lt.astype(jnp.bfloat16),
                    _dims, preferred_element_type=jnp.float32)
            store(c, jnp.round(o))  # box average -> nearest (half-even)
        return 0

    if group == 1:
        scene_body(0, 0)
    else:
        jax.lax.fori_loop(0, group, scene_body, 0)


def _downsample_mats(strip_out: int, aa: int, wc: int, w: int):
    """Vertical box-average with in-strip flip, and horizontal box-average."""
    sh = strip_out * aa
    l = np.zeros((strip_out, sh), np.float32)
    for o in range(strip_out):
        src = (strip_out - 1 - o) * aa
        l[o, src:src + aa] = 1.0 / aa
    r = np.zeros((wc, w), np.float32)
    for c in range(w):
        r[c * aa:(c + 1) * aa, c] = 1.0 / aa
    return l, r


def _fill_kernel(counts_ref, nh_ref, nw_ref, bounds_ref, gymax_ref,
                 edges_ref, wedges_ref, colors_ref,  # all SMEM
                 edges_v_ref,  # VMEM [1, K, NE, V]: fields as lane vectors
                 l_ref, r_ref,  # VMEM
                 out_ref,
                 planes_ref, fill_ref,  # VMEM scratch
                 xit_ref, wxt_ref, trow_ref,  # row-table scratch
                 *, num_slots: int, max_vertices: int, strip_rows: int,
                 num_strips_static: int, wc: int, pil_exact: bool,
                 bg_packed: float, unroll: bool = True,
                 packed: bool = False, h_pass_only: bool = False):
    """One program = one canvas row strip of one scene.

    With `unroll=True` (the TPU path) the edge loops are statically
    unrolled; every per-edge block is predicated on `v < count` so only
    live edges execute, while all SMEM field reads use compile-time
    addresses — measured, per-edge control overhead (dynamic loop trips,
    carry copies, computed addresses) dominated every dynamic variant.
    Accumulators that must cross predicated blocks live in VMEM scratch.
    `unroll=False` runs the same edge math in a fori_loop with carries
    (used by the interpreter, where a 700-block unroll is impractical).
    """
    strip = pl.program_id(1)
    half = 0.0 if pil_exact else 0.5
    if packed:
        # Lane-packed canvas [hc*wc/128, 128]: wc < 128 would otherwise leave
        # (128 - wc) of every vreg's lanes idle — at 64x64 that is half the
        # VPU — and per-row [S, 1] quantities idle 127/128. Flattening
        # pixel index p = out_row*wc + col onto (sublane, lane) makes every
        # edge-loop op fully dense. Single-strip aa=1 only, so the vertical
        # flip folds into the row map (the strip path folds it into L) and
        # no downsample is needed.
        rpl = 128 // wc  # whole output rows per 128-lane vreg row
        shp = (strip_rows * wc // 128, 128)
        sub = jax.lax.broadcasted_iota(jnp.int32, shp, 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, shp, 1)
        out_row = sub * rpl + lane // wc
        rows = (strip_rows - 1 - out_row).astype(jnp.float32) + half
        cols = (lane % wc).astype(jnp.float32) + half
    else:
        row0 = (strip * strip_rows).astype(jnp.float32)
        rows = row0 + jax.lax.broadcasted_iota(
            jnp.int32, (strip_rows, 1), 0).astype(jnp.float32) + half
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (strip_rows, wc), 1).astype(jnp.float32) + half
    colsm = cols - 0.5
    colsp = cols + 0.5

    # The canvas is ONE packed-RGB plane: colors are u8 triplets, so
    # r*65536 + g*256 + b <= 2^24 - 1 is exact in f32. Painting costs one
    # select per sprite instead of three; the plane is unpacked once at the
    # end (exact: all intermediates are integers <= 2^24 and the divisors
    # are powers of two).
    planes_ref[...] = jnp.full_like(cols, bg_packed)

    # Column blocks: lane-dim tiles of <=128 so each sprite only pays for
    # the columns it can touch (sprites typically span a fraction of a big
    # supersampled canvas; rows are already culled by strips). The packed
    # layout interleaves columns across lanes, so it stays unblocked.
    if packed:
        col_blocks = [None]
    else:
        col_blocks = [(w0, min(w0 + 128, wc)) for w0 in range(0, wc, 128)]

    for k in range(num_slots):
        # counts is zeroed for dead slots in XLA, so liveness == count > 0.
        count = counts_ref[0, 0, k]
        hit = ((bounds_ref[0, k, 0] <= strip * strip_rows + strip_rows - 1)
               & (bounds_ref[0, k, 1] >= strip * strip_rows))

        def row_tables(k):
            """Per-(sprite, strip) row quantities, ALL edges at once.

            Edge fields arrive as [1, V] lane vectors (edges_v_ref), so the
            whole per-edge row math — in-range tests, crossing positions,
            bottom-duplicate weights — is ~10 ops on [S, V] instead of ~10
            ops per edge, and the block fill loop degenerates to 2 scratch
            loads + 4 wide ops per edge with no fori carries.
            """
            def fld(i):
                return edges_v_ref[0, k, i:i + 1, :]  # [1, V]

            y0v, mv, x0v = fld(_E_Y0), fld(_E_M), fld(_E_X0)
            inr = (fld(_E_SLANT) > 0.0) & (rows >= fld(_E_YMIN)) \
                & (rows <= fld(_E_YMAX))  # [S, V]
            xi = x0v + (rows - y0v) * mv
            dup = inr & (rows == fld(_E_YMAX)) \
                & (fld(_E_YMAX) < gymax_ref[0, 0, k])
            wgt = inr.astype(jnp.float32) + dup.astype(jnp.float32)
            xit_ref[...] = xi
            wxt_ref[...] = wgt
            trow_ref[:, 0:1] = wgt.sum(axis=1, keepdims=True)  # total
            trow_ref[:, 1:2] = jnp.max(
                jnp.where(wgt > 0, xi, -_BIG), axis=1, keepdims=True)

        # Shared per-edge math (v may be a Python int or a traced index;
        # SMEM scalar loads accept both). Wide quantities are computed on
        # one column block at a time.
        def exact_terms(k, v, gymax, colsm_b, colsp_b):
            e_y0 = edges_ref[0, k, v, _E_Y0]
            e_ymax = edges_ref[0, k, v, _E_YMAX]
            inr = (edges_ref[0, k, v, _E_SLANT] > 0.0) \
                & (rows >= edges_ref[0, k, v, _E_YMIN]) \
                & (rows <= e_ymax)  # [S, 1]
            xi = edges_ref[0, k, v, _E_X0] \
                + (rows - e_y0) * edges_ref[0, k, v, _E_M]
            dup = inr & (rows == e_ymax) & (e_ymax < gymax)
            # f32 weights: tiny exact integers, and VPU f32 multiplies are
            # ~6x faster than emulated i32 multiplies (measured on v5e).
            wgt = inr.astype(jnp.float32) + dup.astype(jnp.float32)
            a = xi <= colsm_b
            b = xi < colsp_b
            return wgt, xi, a, b

        def centroid_term(k, v, cols_b):
            e_y0 = edges_ref[0, k, v, _E_Y0]
            straddle = (e_y0 > rows) != (edges_ref[0, k, v, _E_Y1] > rows)
            xi = edges_ref[0, k, v, _E_X0] \
                + (rows - e_y0) * edges_ref[0, k, v, _E_M]
            return (straddle & (cols_b < xi)).astype(jnp.int32)

        def horiz_term(k, v, colsm_b, colsp_b):
            return ((edges_ref[0, k, v, _E_HORIZ] > 0.0)
                    & (rows == edges_ref[0, k, v, _E_Y0])
                    & (edges_ref[0, k, v, _E_HLO] < colsp_b)
                    & (edges_ref[0, k, v, _E_HHI] > colsm_b)
                    ).astype(jnp.int32)

        def wedge_term(k, v, cols_b):
            return ((wedges_ref[0, k, v, _W_ACTIVE] > 0.0)
                    & (rows == wedges_ref[0, k, v, _W_ROW])
                    & (cols_b >= wedges_ref[0, k, v, _W_LO])
                    & (cols_b <= wedges_ref[0, k, v, _W_HI])
                    ).astype(jnp.int32)

        def trim(le, win, total, rowmax, colsm_b, colsp_b):
            odd = jnp.mod(total, 2.0) == 1.0  # [S, 1]
            le = le - (odd & (rowmax <= colsm_b)).astype(jnp.float32)
            win = win - (odd & (rowmax > colsm_b)
                         & (rowmax < colsp_b)).astype(jnp.float32)
            return ((jnp.mod(le, 2.0) == 1.0) | (win > 0)).astype(jnp.int32)

        def paint(k, blk):
            count = counts_ref[0, 0, k]
            if blk is None:
                sl = slice(None)
                cols_b, colsm_b, colsp_b = cols, colsm, colsp
            else:
                sl = slice(blk[0], blk[1])
                # Fresh per-block iota, NOT cols[:, sl]: Mosaic crashes
                # (array.h limits check) lowering lane-dim slices of a
                # full-width value inside the nested pl.when.
                cols_b = blk[0] + half + jax.lax.broadcasted_iota(
                    jnp.int32, (strip_rows, blk[1] - blk[0]), 1
                ).astype(jnp.float32)
                colsm_b = cols_b - 0.5
                colsp_b = cols_b + 0.5

            if pil_exact and not packed:
                # Row-table fill: the pre-pass (row_tables) already holds
                # every edge's crossing position and weight for this strip,
                # so the per-edge work here is 2 width-1 scratch loads +
                # 4 wide ops, statically unrolled with SSA accumulators —
                # no per-edge row math, no fori carries. Padded edges have
                # wgt 0 and cost only the wide compares.
                zero_f = jnp.zeros_like(cols_b)
                # Accumulate le (x_i <= c-0.5) and bc (x_i < c+0.5); the
                # window count win = bc - le falls out for free since
                # le subset-of bc — one fewer wide op per edge.
                le, bc = zero_f, zero_f
                for v in range(max_vertices):
                    xiv = xit_ref[:, v:v + 1]
                    wgtv = wxt_ref[:, v:v + 1]
                    le = le + wgtv * (xiv <= colsm_b).astype(jnp.float32)
                    bc = bc + wgtv * (xiv < colsp_b).astype(jnp.float32)
                total = trow_ref[:, 0:1]
                rowmax = trow_ref[:, 1:2]
                fill_ref[:, sl] = trim(le, bc - le, total, rowmax,
                                       colsm_b, colsp_b)

                # Horizontal edges / vertex wedges are rare: whole loops
                # are skipped per sprite via precomputed feature counts
                # (hence the fill_ref round-trip for the mask).
                @pl.when(nh_ref[0, 0, k] > 0)
                def _horiz(k=k):
                    for v in range(max_vertices):
                        fill_ref[:, sl] = fill_ref[:, sl] | horiz_term(
                            k, v, colsm_b, colsp_b)

                @pl.when(nw_ref[0, 0, k] > 0)
                def _wedges(k=k):
                    for v in range(max_vertices):
                        fill_ref[:, sl] = fill_ref[:, sl] | wedge_term(
                            k, v, cols_b)
                mask = fill_ref[:, sl] > 0
            elif pil_exact:
                # Packed lane canvas: rows/cols interleave on lanes, so the
                # [1, V] row-table broadcast doesn't apply; keep the fully
                # unrolled per-edge form (padded/dead edges have neutral
                # fields, so no per-edge predication is needed).
                gymax = gymax_ref[0, 0, k]
                zero_f = jnp.zeros_like(cols_b)
                le, bc = zero_f, zero_f
                total = jnp.zeros_like(rows)
                rowmax = jnp.full_like(rows, -_BIG)
                for v in range(max_vertices):
                    wgt, xi, a, b = exact_terms(k, v, gymax,
                                                colsm_b, colsp_b)
                    le = le + wgt * a.astype(jnp.float32)
                    bc = bc + wgt * b.astype(jnp.float32)
                    total = total + wgt
                    rowmax = jnp.maximum(
                        rowmax, jnp.where(wgt > 0, xi, -_BIG))
                fill_ref[:, sl] = trim(le, bc - le, total, rowmax,
                                       colsm_b, colsp_b)

                @pl.when(nh_ref[0, 0, k] > 0)
                def _horiz_p(k=k):
                    for v in range(max_vertices):
                        fill_ref[:, sl] = fill_ref[:, sl] | horiz_term(
                            k, v, colsm_b, colsp_b)

                @pl.when(nw_ref[0, 0, k] > 0)
                def _wedges_p(k=k):
                    for v in range(max_vertices):
                        fill_ref[:, sl] = fill_ref[:, sl] | wedge_term(
                            k, v, cols_b)
                mask = fill_ref[:, sl] > 0
            elif unroll:
                parity = jnp.zeros(cols_b.shape, jnp.int32)
                for v in range(max_vertices):
                    parity = parity ^ centroid_term(k, v, cols_b)
                mask = parity > 0
            else:
                mask = jax.lax.fori_loop(
                    0, count, lambda v, p: p ^ centroid_term(k, v, cols_b),
                    jnp.zeros(cols_b.shape, jnp.int32)) > 0

            planes_ref[:, sl] = jnp.where(
                mask, colors_ref[0, 0, k], planes_ref[:, sl])

        if num_strips_static > 1 or len(col_blocks) > 1:
            # Row tables once per (sprite, strip); then skip whole
            # (sprite, strip, column-block) tiles the bounding box misses.
            if pil_exact and not packed:
                @pl.when((count > 0) & hit)
                def _tables(k=k):
                    row_tables(k)
            for blk in col_blocks:
                gate = (count > 0) & hit
                if blk is not None:
                    gate = gate & (bounds_ref[0, k, 2] <= blk[1] - 1) \
                        & (bounds_ref[0, k, 3] >= blk[0])

                @pl.when(gate)
                def _gated(k=k, blk=blk):
                    paint(k, blk)
        else:
            if pil_exact and not packed:
                row_tables(k)
            paint(k, col_blocks[0])

    # Unpack the packed-RGB plane once (all values are integers <= 2^24 and
    # the divisors are powers of two, so every step below is f32-exact).
    p = planes_ref[...]
    red = jnp.floor(p * (1.0 / 65536.0))
    rem = p - red * 65536.0
    green = jnp.floor(rem * (1.0 / 256.0))
    blue = rem - green * 256.0
    channels = (red, green, blue)

    if packed:
        # No downsample at aa=1; the flip is already folded into `rows`.
        for c in range(3):
            out_ref[0, c] = channels[c]
    elif h_pass_only:
        # Horizontal Lanczos pass with Pillow's intermediate uint8 rounding
        # (R holds the PIL-quantized taps); the vertical pass runs outside
        # the kernel because its 3*aa-row support crosses strip boundaries.
        # PIL row order is preserved — the flip happens after the v-pass.
        rm = r_ref[...]
        for c in range(3):
            t = jax.lax.dot_general(
                channels[c], rm, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)
            out_ref[0, c] = jnp.clip(jnp.floor(t + 0.5), 0.0, 255.0)
    else:
        # Box downsample + vertical flip (folded into L) on the MXU.
        lm = l_ref[...]
        rm = r_ref[...]
        for c in range(3):
            half_ds = jax.lax.dot_general(
                lm, channels[c], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[0, c] = jax.lax.dot_general(
                half_ds, rm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)


def _pick_strip(h: int, aa: int, wc: int, limit: int = 16000) -> int:
    """Output rows per program: ~`limit` supersampled pixels per strip.

    Big canvases split into strips (bounded VMEM + per-sprite row
    skipping); small ones render whole-frame. Mosaic needs the output block
    sublane dim to be a multiple of 8 or to span the array. The ~16K-pixel
    default is measured on v5e (64x64/AA=5 exact fill): finer strips beat
    coarser ones because per-sprite row skipping prunes more work than the
    extra program dispatches cost.
    """
    if h % 8 != 0:
        return h
    strip_out = 8
    for cand in (64, 32, 16):
        if h % cand == 0 and cand * aa * wc <= limit:
            strip_out = cand
            break
    if h * aa * wc <= limit:
        strip_out = h
    return strip_out


def _prepare(factors, num_sprites, hc, wc, color_to_rgb, pil_exact):
    """XLA-side per-scene precomputation (vmapped over the batch)."""
    verts_w = geometry.world_vertices(factors)
    verts_c = verts_w * jnp.asarray([wc, hc], jnp.float32)
    shape_ids = factors[:, state_lib.SHAPE].astype(jnp.int32)
    k = factors.shape[0]
    live = jnp.arange(k) < num_sprites
    # Dead slots get count 0: their edges turn neutral and the kernel skips
    # them without a separate liveness flag.
    counts = jnp.where(live, jnp.asarray(_COUNTS_HOST)[shape_ids], 0)

    colors = factors[:, 5:8]
    if color_to_rgb is not None:
        colors = color_to_rgb(colors)
    colors = jnp.clip(colors, 0, 255).astype(jnp.uint8).astype(jnp.float32)
    # Pack (r, g, b) into one f32 (exact: value <= 2^24 - 1) — the kernel
    # paints a single packed plane.
    colors = colors[:, 0] * 65536.0 + colors[:, 1] * 256.0 + colors[:, 2]

    edges, wedges, gymax = _build_edge_tables(verts_c, counts, pil_exact)
    nh = edges[..., _E_HORIZ].astype(jnp.int32).sum(-1)
    nw = wedges[..., _W_ACTIVE].astype(jnp.int32).sum(-1)

    ys = verts_c[..., 1]
    xs = verts_c[..., 0]
    vmax = verts_c.shape[-2]
    vidx = jnp.arange(vmax)[None, :] < counts[:, None]
    ymin = jnp.min(jnp.where(vidx, ys, _BIG), axis=-1)
    ymax = jnp.max(jnp.where(vidx, ys, -_BIG), axis=-1)
    xmin = jnp.min(jnp.where(vidx, xs, _BIG), axis=-1)
    xmax = jnp.max(jnp.where(vidx, xs, -_BIG), axis=-1)
    # Conservative pixel bounds for strip/column-block culling. Columns get
    # a 2px margin: wedge extensions reach round_half_up(u) +- 1 of an edge
    # intersection that stays inside the vertex x-extent, and pair/window
    # fills reach at most extent + 0.5.
    bounds = jnp.stack(
        [jnp.floor(ymin) - 1.0, jnp.ceil(ymax) + 1.0,
         jnp.floor(xmin) - 2.0, jnp.ceil(xmax) + 2.0],
        axis=-1).astype(jnp.int32)

    return edges, wedges, gymax, bounds, counts, nh, nw, colors


@functools.partial(
    jax.jit, static_argnames=(
        "image_size", "anti_aliasing", "bg_color", "color_to_rgb",
        "pil_exact", "downsample", "interpret", "strip_limit",
        "unroll_multi", "kernel_mode", "scene_cspan", "scene_group"))
def render_rgb_batch(factors: jnp.ndarray,
                     num_sprites: jnp.ndarray,
                     *,
                     image_size: Tuple[int, int] = (64, 64),
                     anti_aliasing: int = 1,
                     bg_color: Optional[Tuple[int, int, int]] = None,
                     color_to_rgb: Optional[Callable] = None,
                     pil_exact: bool = True,
                     downsample: str = "auto",
                     interpret="auto",
                     strip_limit: int = 16000,
                     unroll_multi: bool = False,
                     kernel_mode: str = "auto",
                     scene_cspan: Optional[int] = None,
                     scene_group: Optional[int] = None) -> jnp.ndarray:
    """Render a batch of scenes to u8[B, H, W, 3] (math orientation).

    factors: f32[B, K, 10]; num_sprites: i32[B]. `interpret="auto"` runs
    the Pallas interpreter off-TPU so the path works everywhere.
    kernel_mode: "scene" = one program per scene (whole canvas in VMEM;
    the AA>1 fast path), "strips" = row-strip grid (bounded VMEM for big
    canvases), "auto" picks scene when the supersampled canvas fits.
    """
    if interpret == "auto":
        interpret = jax.default_backend() != "tpu"
    h, w = image_size
    aa = int(anti_aliasing)
    hc, wc = h * aa, w * aa
    b, k, _ = factors.shape
    if downsample == "auto":
        downsample = "lanczos" if pil_exact else "box"
    lanczos = downsample == "lanczos" and aa > 1

    strip_out = _pick_strip(h, aa, wc, strip_limit)
    strip_rows = strip_out * aa
    num_strips = hc // strip_rows

    edges, wedges, gymax, bounds, counts, nh, nw, colors = jax.vmap(
        lambda f, n: _prepare(f, n, hc, wc, color_to_rgb, pil_exact)
    )(factors, num_sprites)
    vmax = edges.shape[2]

    l_host, r_host = _downsample_mats(strip_out, aa, wc, w)
    if lanczos:
        # R becomes the PIL-quantized horizontal Lanczos taps [wc, w]; the
        # (unused) L keeps its shape so the kernel signature is uniform.
        r_host = resample.pil_lanczos_matrix(wc, w).T.copy()
    bg = tuple(float(c) for c in (bg_color or (0, 0, 0)))
    bg_packed = bg[0] * 65536.0 + bg[1] * 256.0 + bg[2]

    # Loop strategy (measured on v5e): small canvases are control-bound —
    # fully unroll (padded edges are neutral and nearly free); multi-strip
    # big canvases are vector-bound — a count-limited fori_loop plus
    # per-sprite row skipping wins there. Interpreter always uses fori.
    unroll = (not interpret) and (num_strips == 1 or unroll_multi)
    # Lane-packed canvas (see _fill_kernel): narrow canvases waste
    # (128 - wc)/128 of every vreg; at aa=1 there is no downsample, so the
    # whole frame can live flattened as [h*w/128, 128]. Divisors of 128 are
    # powers of two, so the kernel's index math reduces to shifts/masks.
    packed = (aa == 1 and num_strips == 1 and wc < 128
              and 128 % wc == 0 and (hc * wc) % 128 == 0
              and kernel_mode != "scene")

    if kernel_mode == "auto":
        # Scene-per-program when the supersampled canvas fits VMEM with
        # comfortable headroom (canvas + downsample operands + buffers).
        # TPU-compiled only: the scene kernel's downsample matmul order
        # differs from resample.pil_resize_lanczos by f32 sum-order ulps
        # (+-1 on ~1e-4 of pixels), which is inside the documented TPU
        # tolerance but would break the CPU paths' bit-exactness pledge.
        kernel_mode = ("scene" if not packed and not interpret and k > 0
                       and wc % 8 == 0 and hc * wc * 4 <= 2_500_000
                       else "strips")
    elif kernel_mode == "scene" and (wc % 8 or k == 0):
        # An explicit mode is the user's call (renderers._pallas_call
        # surfaces it); honoring the contract means refusing loudly when the
        # scene branch's hard preconditions fail instead of silently
        # degrading to strips with the scene knobs ignored.
        raise ValueError(
            "kernel_mode='scene' requires an 8-aligned supersampled width "
            f"(W*anti_aliasing = {wc}) and max_sprites > 0 (got {k}); use "
            "kernel_mode='strips' or 'auto' for this configuration.")
    if (scene_cspan is not None or scene_group is not None) \
            and kernel_mode != "scene":
        raise ValueError(
            "scene_cspan/scene_group tune the scene kernel only, but "
            f"kernel_mode resolved to {kernel_mode!r} here — they would be "
            "silently ignored. Pass kernel_mode='scene' (or drop the knobs).")
    if kernel_mode == "scene":
        if lanczos:
            rt_host = resample.pil_lanczos_matrix(wc, w).copy()   # [w, wc]
            lt_host = resample.pil_lanczos_matrix(hc, h)[::-1].T.copy()
        else:
            l_host2, r_host2 = _downsample_mats(h, aa, wc, w)
            rt_host = r_host2.T.copy()  # [w, wc]
            lt_host = l_host2.T.copy()  # [hc, h] (flip folded)
        # Scene-kernel tuning knobs (measured on v5e, 64x64/AA=5/6 sprites;
        # see PERF_NOTES.md): cspan is the sublane window span each sprite
        # paints — wide enough for typical sprite bboxes (scale<=0.3 at
        # AA=5 is <=96 columns -> usually one window), narrow enough not to
        # waste VPU rows on background.
        if scene_cspan is not None and (
                scene_cspan % 8 or not 8 <= scene_cspan <= wc):
            # The kernel promises Mosaic 8-aligned dynamic sublane offsets
            # (cstart = clo8 + wi*cspan); an unaligned span would be
            # silently miscompiled, so reject it loudly.
            raise ValueError(
                f"scene_cspan must be a multiple of 8 in [8, {wc}]; got "
                f"{scene_cspan}")
        if scene_group is not None and (scene_group < 1
                                        or b % scene_group):
            # grid = (b // group,): a non-divisor would silently leave the
            # trailing scenes unrendered.
            raise ValueError(
                f"scene_group must divide the batch size {b}; got "
                f"{scene_group}")
        # 96 re-tuned at the straight-line fill balance: wide enough that
        # the guarded extra-window loop never fires for typical sprites
        # (scale <= 0.3 at AA=5), ~0.4 ms/2048 better than 80 on v5e.
        cspan = scene_cspan if scene_cspan else min(wc, 96)
        group = scene_group if scene_group \
            else next((g for g in (4, 2) if b % g == 0), 1)
        # One packed SMEM table per scene: scalars, then (pil_exact only)
        # the ACTIVE Pillow features compacted to the front as
        # (row, lo, hi) integer intervals — horizontal-edge fills and
        # vertex wedges both reduce to closed integer column intervals on
        # one row, so the kernel pays per active feature, not per vertex.
        fastok = _scene_fastok(edges, gymax, hc, pil_exact)
        scal = jnp.stack([
            counts.astype(jnp.float32),
            (nh + nw).astype(jnp.float32),
            colors,
            gymax,
            bounds[..., 0].astype(jnp.float32),
            bounds[..., 1].astype(jnp.float32),
            bounds[..., 2].astype(jnp.float32),
            bounds[..., 3].astype(jnp.float32),
            fastok.astype(jnp.float32),
        ], axis=-1)  # [B, K, _NS] — order must match the _TS_* indices
        if pil_exact:
            nslots = 2 * vmax
            # Candidates: horiz edges fill [hlo, hhi] on row y0 (the
            # strict +-0.5 tests equal closed integer bounds); wedges fill
            # [wlo, whi] on their vertex row. All values integer-valued.
            act = jnp.concatenate([
                edges[..., _E_HORIZ] > 0.0,
                wedges[..., _W_ACTIVE] > 0.0,
            ], axis=-1)  # [B, K, 2V]
            cand = jnp.stack([
                jnp.concatenate([edges[..., _E_Y0],
                                 wedges[..., _W_ROW]], axis=-1),
                jnp.concatenate([edges[..., _E_HLO],
                                 wedges[..., _W_LO]], axis=-1),
                jnp.concatenate([edges[..., _E_HHI],
                                 wedges[..., _W_HI]], axis=-1),
            ], axis=-1)  # [B, K, 2V, 3]
            pos = jnp.cumsum(act, axis=-1) - 1
            # Fused masked reduction instead of a one-hot einsum: a
            # dot_general would MATERIALIZE the [B, K, 2V, 2V] one-hot
            # operand in HBM (~180 MB per 2048x6 batch — measured ~0.4 ms
            # per sprite slot of pure bandwidth); the where+sum chain fuses
            # into one reduce with no intermediate. All values are exact in
            # f32 (0/1 selectors, integer coordinates <= canvas size).
            sel = (pos[..., None, :] == jnp.arange(nslots)[:, None]) \
                & act[..., None, :]                      # [B, K, 2V, 2V]
            ftab = jnp.where(sel[..., None], cand[..., None, :, :],
                             0.0).sum(axis=-2)           # [B, K, 2V, 3]
            tab = jnp.concatenate(
                [scal, ftab.reshape(b, k, nslots * 3)], axis=-1)
        else:
            tab = scal
        feat = tab.shape[-1]
        assert feat == _NS + (2 * vmax * 3 if pil_exact else 0), \
            "SMEM table layout out of sync with the _TS_* indices"

        # Edge-field block [B, _NEF, K*Vp] (field rows; sprite x vertex
        # flattened on lanes): the kernel builds the scanline tables for
        # ALL sprites in one batched pass from these rows (see its
        # docstring). Vertex slots are padded to a sublane multiple with
        # NEUTRAL fields: y-range inverted (weight 0 for the exact fill)
        # and y1 == y0 == 0 (no straddle for the centroid fill), so
        # kernel loops may safely overrun into padding. The canvas row
        # dim is padded to a 128-lane multiple so the kernel can address
        # whole lane tiles dynamically; the padded vertical downsample
        # rows are zero.
        vp = -(-vmax // 8) * 8  # pad vertex rows to a sublane multiple
        hcp = -(-hc // 128) * 128
        lt_host = np.pad(lt_host, ((0, hcp - hc), (0, 0)))

        def padf(field, fill):
            return jnp.pad(edges[..., field],
                           ((0, 0), (0, 0), (0, vp - vmax)),
                           constant_values=fill)

        ef = jnp.stack([
            padf(_E_Y0, 0.0),
            padf(_E_M, 0.0),
            padf(_E_X0, 0.0),
            padf(_E_YMIN, _BIG),
            padf(_E_YMAX, -_BIG),
            padf(_E_Y1, 0.0),
            jnp.broadcast_to(gymax[..., None], (b, k, vp)),
        ], axis=1)  # [B, 7, K, Vp] — order must match the _EF_* indices
        ef = jnp.pad(ef, ((0, 0), (0, _NEF - 7), (0, 0), (0, 0)))
        ef = ef.reshape(b, _NEF, k * vp)

        # anti_aliasing=1: the box matrices are identities (R exactly; L an
        # identity plus the flip) — skip the matmul operands entirely and
        # let the caller's output relayout below carry the flip.
        identity_ds = aa == 1 and not lanczos
        kernel = functools.partial(
            _fill_kernel_scene, num_slots=k, max_vertices=vmax,
            hc=hc, wc=wc, h=h, w=w, pil_exact=pil_exact,
            bg_packed=bg_packed, lanczos=lanczos, cspan=cspan, group=group,
            interpret=bool(interpret), identity_ds=identity_ds)
        scratch = [
            pltpu.VMEM((wc, hcp), jnp.float32),       # packed-RGB canvas
            pltpu.VMEM((k * vp, hcp), jnp.float32),   # xi tables (all K)
        ]
        if pil_exact:
            scratch.append(
                pltpu.VMEM((k * vp, hcp), jnp.float32))  # weights (all K)
        # Single-interval fast path: per-row a/b interval bounds.
        scratch.append(pltpu.VMEM((8, hcp), jnp.float32))
        if lanczos:
            # Host-side split-tap layout for the in-kernel downsample: the
            # h-pass taps stacked [hi; lo] on M, the v-pass hi/lo as two
            # operands (see the kernel's lanczos branch).
            rtj = jnp.asarray(rt_host)
            rhi = rtj.astype(jnp.bfloat16)
            rt2 = jnp.concatenate(
                [rhi, (rtj - rhi.astype(jnp.float32)).astype(jnp.bfloat16)],
                axis=0)                                      # [2w, wc]
            ltj = jnp.asarray(lt_host)
            lhi = ltj.astype(jnp.bfloat16)
            llo = (ltj - lhi.astype(jnp.float32)).astype(jnp.bfloat16)
            mats = (rt2, lhi, llo)
            mat_specs = [
                pl.BlockSpec((2 * w, wc), lambda b_: (0, 0),
                             memory_space=pltpu.VMEM),       # [Rh^T hi; lo]
                pl.BlockSpec((hcp, h), lambda b_: (0, 0),
                             memory_space=pltpu.VMEM),       # Lv^T hi
                pl.BlockSpec((hcp, h), lambda b_: (0, 0),
                             memory_space=pltpu.VMEM),       # Lv^T lo
            ]
        elif identity_ds:
            mats = ()
            mat_specs = []
        else:
            mats = (jnp.asarray(rt_host), jnp.asarray(lt_host))
            mat_specs = [
                pl.BlockSpec((w, wc), lambda b_: (0, 0),
                             memory_space=pltpu.VMEM),       # Rh^T
                pl.BlockSpec((hcp, h), lambda b_: (0, 0),
                             memory_space=pltpu.VMEM),       # Lv^T (flip)
            ]
        out = pl.pallas_call(
            kernel,
            grid=(b // group,),
            in_specs=[
                pl.BlockSpec((group, k, feat), lambda b_: (b_, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((group, _NEF, k * vp),
                             lambda b_: (b_, 0, 0),
                             memory_space=pltpu.VMEM),       # edge fields
                *mat_specs,
            ],
            out_specs=pl.BlockSpec(
                (group, 3, w, h), lambda b_: (b_, 0, 0, 0),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, 3, w, h), jnp.uint8),
            scratch_shapes=scratch,
            interpret=interpret,
        )(tab, ef, *mats)
        if identity_ds:
            # Kernel stored PIL row order; the flip fuses into the output
            # relayout below.
            out = jnp.flip(out, axis=3)
        # [B, 3, x, y] -> [B, y, x, 3] (y = final image row, flip done).
        return out.transpose(0, 3, 2, 1)
    cshape = ((hc * wc) // 128, 128) if packed else (strip_rows, wc)
    kernel = functools.partial(
        _fill_kernel, num_slots=k, max_vertices=vmax,
        strip_rows=strip_rows, num_strips_static=num_strips, wc=wc,
        pil_exact=pil_exact, bg_packed=bg_packed, unroll=unroll,
        packed=packed, h_pass_only=lanczos)

    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    scratch_i32 = pltpu.VMEM(cshape, jnp.int32)

    if packed:
        out_specs = pl.BlockSpec(
            (1, 3) + cshape, lambda b_, s: (b_, 0, 0, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 3) + cshape, jnp.float32)
    elif lanczos:
        # h-pass output keeps PIL row order and full supersampled height.
        out_specs = pl.BlockSpec(
            (1, 3, strip_rows, w), lambda b_, s: (b_, 0, s, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 3, hc, w), jnp.float32)
    else:
        out_specs = pl.BlockSpec(
            (1, 3, strip_out, w),
            lambda b_, s: (b_, 0, num_strips - 1 - s, 0),
            memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, 3, h, w), jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(b, num_strips),
        in_specs=[
            smem((1, 1, k), lambda b_, s: (b_, 0, 0)),        # counts
            smem((1, 1, k), lambda b_, s: (b_, 0, 0)),        # nh
            smem((1, 1, k), lambda b_, s: (b_, 0, 0)),        # nw
            smem((1, k, 4), lambda b_, s: (b_, 0, 0)),        # bounds
            smem((1, 1, k), lambda b_, s: (b_, 0, 0)),        # gymax
            smem((1, k, vmax, _NE),
                 lambda b_, s: (b_, 0, 0, 0)),                # edges
            smem((1, k, vmax, _NW),
                 lambda b_, s: (b_, 0, 0, 0)),                # wedges
            smem((1, 1, k), lambda b_, s: (b_, 0, 0)),        # colors packed
            vmem((1, k, _NE, vmax),
                 lambda b_, s: (b_, 0, 0, 0)),                # edge lane-vecs
            vmem((strip_out, strip_rows), lambda b_, s: (0, 0)),  # L (flip)
            vmem((wc, w), lambda b_, s: (0, 0)),              # R
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM(cshape, jnp.float32),  # packed-RGB plane
            scratch_i32,                      # fill
            pltpu.VMEM((strip_rows, vmax), jnp.float32),  # xi row table
            pltpu.VMEM((strip_rows, vmax), jnp.float32),  # wgt row table
            pltpu.VMEM((strip_rows, 8), jnp.float32),     # total/rowmax
        ],
        interpret=interpret,
    )(
        counts.reshape(b, 1, k),
        nh.reshape(b, 1, k),
        nw.reshape(b, 1, k),
        bounds,
        gymax.reshape(b, 1, k),
        edges,
        wedges,
        colors.reshape(b, 1, k),
        edges.transpose(0, 1, 3, 2),  # [B, K, NE, V] fields as lane vectors
        jnp.asarray(l_host),
        jnp.asarray(r_host),
    )
    if packed:
        out = out.reshape(b, 3, h, w)  # un-flatten the lane-packed canvas
    if lanczos:
        # Vertical Lanczos pass (PIL-quantized taps) + flip to math coords.
        kh = jnp.asarray(resample.pil_lanczos_matrix(hc, h))  # [h, hc]
        out = jnp.einsum("oh,bchw->bcow", kh, out,
                         precision=jax.lax.Precision.HIGHEST)
        out = jnp.clip(jnp.floor(out + 0.5), 0.0, 255.0)
        out = jnp.flip(out, axis=2)
        return out.transpose(0, 2, 3, 1).astype(jnp.uint8)
    return jnp.round(out.transpose(0, 2, 3, 1)).astype(jnp.uint8)


def render_rgb(factors: jnp.ndarray,
               num_sprites: jnp.ndarray,
               **kwargs) -> jnp.ndarray:
    """Render one scene to u8[H, W, 3]; see render_rgb_batch."""
    return render_rgb_batch(
        factors[None], jnp.asarray(num_sprites)[None], **kwargs)[0]
