"""PCSR — row-partitioned sparse matrix with own/ghost split-block storage.

The PSparseMatrix analog (SURVEY.md §1 L3), re-designed for TPU: each shard
stores its row block as two padded ELL planes — the **diag block** (columns
owned by the same shard, local indices) and the **offdiag block** (columns
resolved through a ghost buffer filled by a static all-to-all halo plan).
``matvec`` is one shard_map kernel per call:

    send-window gather → lax.all_to_all → ghost gather → diag+offdiag SpMV

which is the collective-based equivalent of the reference stack's
Isend/Irecv ``consistent!`` exchange (SURVEY.md §2.6), expressed so XLA can
schedule the exchange against the diag-block compute.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from parallel_amg_tpu.parallel.mesh import ROW_AXIS
from parallel_amg_tpu.parallel.partition import (
    Partition,
    build_halo_plan,
    uniform_row_partition,
)


@jax.tree_util.register_pytree_node_class
class PCSR:
    """Distributed sparse matrix over a 1D mesh axis "rows".

    Array fields all carry a leading shard axis S (sharded over the mesh);
    static metadata rides in the pytree aux. ``shape`` is the PADDED global
    shape (S·m_row, S·m_col) so vector code aligns without ragged handling;
    ``true_shape`` keeps the logical dimensions.
    """

    def __init__(self, diag_cols, diag_vals, off_cols, off_vals,
                 send_idx, recv_map, mesh, row_partition, col_partition,
                 true_shape, nb_offsets=None, nb_send=None,
                 nb_recv_map=None):
        self.diag_cols = diag_cols  # (S, m, Wd) int32, local col ids
        self.diag_vals = diag_vals  # (S, m, Wd)
        self.off_cols = off_cols    # (S, m, Wo) int32, ghost slot ids
        self.off_vals = off_vals    # (S, m, Wo)
        self.send_idx = send_idx    # (S, S, C) int32
        self.recv_map = recv_map    # (S, G) int32 (flat recv pos, trash=S*C)
        self.mesh = mesh
        self.row_partition = row_partition
        self.col_partition = col_partition
        self.true_shape = tuple(true_shape)
        # neighbor-wise exchange plan (with_neighbor_plan): per shard-offset
        # d, a (S, C_d) send table driven by a ppermute ring shift — the
        # exchanged bytes scale with the ACTUAL neighbor count instead of
        # the dense S×C all_to_all (SURVEY.md §2.6 point-to-point row).
        self.nb_offsets = tuple(nb_offsets) if nb_offsets else None
        self.nb_send = tuple(nb_send) if nb_send is not None else None
        self.nb_recv_map = nb_recv_map

    # -- pytree -----------------------------------------------------------
    def tree_flatten(self):
        children = (self.diag_cols, self.diag_vals, self.off_cols,
                    self.off_vals, self.send_idx, self.recv_map,
                    self.nb_send, self.nb_recv_map)
        aux = (self.mesh, self.row_partition, self.col_partition,
               self.true_shape, self.nb_offsets)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        mesh, row_p, col_p, true_shape, nb_offsets = aux
        *core, nb_send, nb_recv_map = children
        return cls(*core, mesh, row_p, col_p, true_shape,
                   nb_offsets=nb_offsets, nb_send=nb_send,
                   nb_recv_map=nb_recv_map)

    # -- properties -------------------------------------------------------
    @property
    def shape(self):
        return (self.row_partition.n_padded, self.col_partition.n_padded)

    @property
    def n_shards(self) -> int:
        return self.row_partition.n_shards

    @property
    def nnz(self):
        return (jnp.sum(self.diag_vals != 0) + jnp.sum(self.off_vals != 0))

    # -- construction -----------------------------------------------------
    @classmethod
    def from_csr(cls, csr, mesh, col_partition: Partition | None = None,
                 dtype=jnp.float32, pad_identity: bool = True) -> "PCSR":
        """Partition a host CSR across the mesh (runs once, numpy).

        pad_identity: give padding rows a unit diagonal (square operators —
        keeps smoothers well-defined); False → zero rows (P/R transfers).
        """
        n_rows, n_cols = csr.shape
        S = mesh.devices.size
        row_part = uniform_row_partition(n_rows, S)
        col_part = col_partition or uniform_row_partition(n_cols, S)
        m, mc = row_part.rows_per_shard, col_part.rows_per_shard

        indptr, indices, data = csr.indptr, csr.indices, csr.data

        # native C++ fast path for the O(nnz) partition scans (native/);
        # the numpy loop below is the fallback + correctness oracle
        from parallel_amg_tpu import native

        built = native.pcsr_partition(indptr, indices, data,
                                      n_rows, S, m, mc)
        if built is not None:
            diag_cols, diag_vals, off_cols, off_vals, ghost_sets = built
            if pad_identity and n_rows == n_cols:
                for s in range(S):
                    lo, hi = row_part.own_range(s)
                    pad = np.arange(hi - lo, m)
                    diag_cols[s, pad, 0] = pad
                    diag_vals[s, pad, 0] = 1.0
            plan = build_halo_plan(ghost_sets, col_part)
            return cls(
                diag_cols=jnp.asarray(diag_cols),
                diag_vals=jnp.asarray(diag_vals, dtype=dtype),
                off_cols=jnp.asarray(off_cols),
                off_vals=jnp.asarray(off_vals, dtype=dtype),
                send_idx=jnp.asarray(plan.send_idx),
                recv_map=jnp.asarray(plan.recv_map),
                mesh=mesh,
                row_partition=row_part,
                col_partition=col_part,
                true_shape=(n_rows, n_cols),
            )

        per_shard = []
        ghost_sets = []
        for s in range(S):
            lo, hi = row_part.own_range(s)
            rows = []
            for i in range(lo, hi):
                cols_i = indices[indptr[i]: indptr[i + 1]]
                vals_i = data[indptr[i]: indptr[i + 1]]
                own = col_part.owner_of(cols_i) == s
                rows.append((cols_i[own] - s * mc, vals_i[own],
                             cols_i[~own], vals_i[~own]))
            # pad rows to m
            for r in range(hi - lo, m):
                if pad_identity and n_rows == n_cols:
                    rows.append((np.array([r]), np.array([1.0]),
                                 np.empty(0, np.int64), np.empty(0)))
                else:
                    rows.append((np.empty(0, np.int64), np.empty(0),
                                 np.empty(0, np.int64), np.empty(0)))
            ghost = np.unique(np.concatenate([r[2] for r in rows])) \
                if any(len(r[2]) for r in rows) else np.empty(0, np.int64)
            ghost_sets.append(ghost.astype(np.int64))
            per_shard.append(rows)

        plan = build_halo_plan(ghost_sets, col_part)
        Wd = max(max(len(r[0]) for r in rows) for rows in per_shard)
        Wo = max(max(len(r[2]) for r in rows) for rows in per_shard)
        Wd, Wo = max(Wd, 1), max(Wo, 1)

        diag_cols = np.zeros((S, m, Wd), dtype=np.int32)
        diag_vals = np.zeros((S, m, Wd), dtype=np.float64)
        off_cols = np.zeros((S, m, Wo), dtype=np.int32)
        off_vals = np.zeros((S, m, Wo), dtype=np.float64)
        for s, rows in enumerate(per_shard):
            gslot = {int(g): k for k, g in enumerate(ghost_sets[s])}
            for r, (dc, dv, oc, ov) in enumerate(rows):
                diag_cols[s, r, : len(dc)] = dc
                diag_vals[s, r, : len(dv)] = dv
                off_cols[s, r, : len(oc)] = [gslot[int(c)] for c in oc]
                off_vals[s, r, : len(ov)] = ov

        return cls(
            diag_cols=jnp.asarray(diag_cols),
            diag_vals=jnp.asarray(diag_vals, dtype=dtype),
            off_cols=jnp.asarray(off_cols),
            off_vals=jnp.asarray(off_vals, dtype=dtype),
            send_idx=jnp.asarray(plan.send_idx),
            recv_map=jnp.asarray(plan.recv_map),
            mesh=mesh,
            row_partition=row_part,
            col_partition=col_part,
            true_shape=(n_rows, n_cols),
        )

    # -- neighbor-wise exchange plan --------------------------------------
    def with_neighbor_plan(self) -> "PCSR":
        """Derive the ppermute-ring exchange plan from the dense plan.

        The dense plan ships a max-over-all-pairs C-sized buffer between
        EVERY shard pair (S·C entries per shard per exchange); real
        row-partitioned operators have O(1) neighbors, so this plan keeps
        one (S, C_d) table per nonzero-traffic shard offset d and moves it
        with a single ``ppermute`` ring shift — exchanged bytes become
        Σ_d C_d ≈ neighbor_count × C.  Runs once on host (numpy over the
        static plan arrays); ``matvec`` uses the ring path automatically.
        """
        S = self.n_shards
        C = self.send_idx.shape[2]
        rmap = np.asarray(self.recv_map)  # (S, G)
        sidx = np.asarray(self.send_idx)
        valid = rmap < S * C
        owner = np.where(valid, rmap // C, 0)
        rank = np.where(valid, rmap % C, 0)
        s_col = np.arange(S)[:, None]
        d_all = np.where(valid, (s_col - owner) % S, -1)
        offsets = sorted({int(d) for d in np.unique(d_all) if d > 0})
        if not offsets:
            offsets = [1]  # degenerate: no ghosts at all; keep shapes legal
        # invariant the truncation relies on: no self-owned ghosts — a plan
        # violating it would silently read zeros from the trash slot
        # (ADVICE r3); fail loudly at plan-build time instead
        assert not np.any(valid & (d_all == 0)), (
            "with_neighbor_plan: dense plan contains self-owned ghosts")
        nb_send, bases, cds = [], {}, {}
        base = 0
        for d in offsets:
            # shard o's send list for offset d is exactly its dense-plan
            # list for destination (o+d)%S, truncated to the offset's max
            cd = 1
            for s in range(S):
                o = (s - d) % S
                cd = max(cd, int((valid[s] & (owner[s] == o)).sum()))
            dest = (np.arange(S) + d) % S
            nb_send.append(jnp.asarray(
                sidx[np.arange(S), dest, :cd], dtype=jnp.int32))
            bases[d] = base
            cds[d] = cd
            base += cd
        trash = base
        nb_rmap = np.full(rmap.shape, trash, np.int32)
        for d in offsets:
            sel = valid & (d_all == d)
            # per-(owner,dest) ranks must be contiguous from 0 within cd —
            # both plan builders guarantee it; assert so a future plan that
            # violates it fails here, not as silent zeros in matvec
            assert rank[sel].size == 0 or int(rank[sel].max()) < cds[d], (
                f"with_neighbor_plan: ghost rank ≥ send width for offset {d}")
            nb_rmap[sel] = bases[d] + rank[sel]
        return PCSR(self.diag_cols, self.diag_vals, self.off_cols,
                    self.off_vals, self.send_idx, self.recv_map, self.mesh,
                    self.row_partition, self.col_partition, self.true_shape,
                    nb_offsets=offsets, nb_send=nb_send,
                    nb_recv_map=jnp.asarray(nb_rmap))

    # -- distributed SpMV -------------------------------------------------
    def matvec(self, x):
        """y = A @ x for a global sharded x of shape (n_cols_padded,).

        Uses the neighbor-wise ppermute plan when present
        (``with_neighbor_plan``), the dense all_to_all plan otherwise."""
        if self.nb_send is not None:
            return self._matvec_neighbor(x)
        # Per-shard shapes inside shard_map: dc (1,m,Wd) dv (1,m,Wd)
        # oc (1,m,Wo) ov (1,m,Wo) sidx (1,S,C) rmap (1,G) xl (mc,)
        def body(dc, dv, oc, ov, sidx, rmap, xl):
            dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
            sidx, rmap = sidx[0], rmap[0]
            buf = xl[sidx]  # (S, C) — send windows for every destination
            recv = jax.lax.all_to_all(buf, ROW_AXIS, 0, 0, tiled=True)
            gvals = jnp.concatenate(
                [recv.reshape(-1), jnp.zeros((1,), xl.dtype)]
            )[rmap]  # (G,)
            y = jnp.sum(dv * xl[dc], axis=-1) + jnp.sum(ov * gvals[oc], axis=-1)
            return y

        spec1 = P(ROW_AXIS)
        return jax.shard_map(
            body,
            mesh=self.mesh,
            in_specs=(spec1, spec1, spec1, spec1, spec1, spec1, spec1),
            out_specs=spec1,
        )(self.diag_cols, self.diag_vals, self.off_cols, self.off_vals,
          self.send_idx, self.recv_map, x)

    def _matvec_neighbor(self, x):
        S = self.n_shards
        offsets = self.nb_offsets

        def body(dc, dv, oc, ov, rmap, xl, *tbls):
            dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
            rmap = rmap[0]
            parts = []
            for d, tbl in zip(offsets, tbls):
                perm = [(i, (i + d) % S) for i in range(S)]
                parts.append(jax.lax.ppermute(xl[tbl[0]], ROW_AXIS, perm))
            gvals = jnp.concatenate(
                parts + [jnp.zeros((1,), xl.dtype)])[rmap]
            return (jnp.sum(dv * xl[dc], axis=-1)
                    + jnp.sum(ov * gvals[oc], axis=-1))

        spec = P(ROW_AXIS)
        n_in = 6 + len(self.nb_send)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(spec,) * n_in, out_specs=spec,
        )(self.diag_cols, self.diag_vals, self.off_cols, self.off_vals,
          self.nb_recv_map, x, *self.nb_send)

    # -- ghost exchange primitives (the consistent!/assemble! analogs) ----
    def consistent(self, x):
        """Fetch ghost values of x for every shard — the reference stack's
        ``consistent!`` (SURVEY.md §2.1).  Returns a (S, G) global array
        (sharded on axis 0): row s holds shard s's ghost buffer."""
        def body(sidx, rmap, xl):
            sidx, rmap = sidx[0], rmap[0]
            buf = xl[sidx]
            recv = jax.lax.all_to_all(buf, ROW_AXIS, 0, 0, tiled=True)
            gvals = jnp.concatenate(
                [recv.reshape(-1), jnp.zeros((1,), xl.dtype)]
            )[rmap]
            return gvals[None]

        spec = P(ROW_AXIS)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(spec, spec, spec),
            out_specs=spec,
        )(self.send_idx, self.recv_map, x)

    def assemble(self, ghost_vals, y=None):
        """Reverse exchange — the ``assemble!`` owner-reduce (SURVEY.md
        §2.1): each shard's ghost-slot accumulations (S, G) are routed back
        through the halo plan and added at their owners.  Returns the
        (n_cols_padded,) sharded owner-sum (added onto y when given)."""
        C = self.send_idx.shape[2]
        S = self.n_shards
        mc = self.col_partition.rows_per_shard

        def body(sidx, rmap, gv, yl):
            sidx, rmap, gv = sidx[0], rmap[0], gv[0]
            # scatter ghost values into the (S*C)+trash send-back buffer
            buf = jnp.zeros((S * C + 1,), gv.dtype).at[rmap].add(gv)
            buf = buf[: S * C].reshape(S, C)
            recv = jax.lax.all_to_all(buf, ROW_AXIS, 0, 0, tiled=True)
            # recv[src, j] adds at local index send_idx[self, src, j];
            # padded slots carry zeros so a plain segment-sum is safe
            add = jax.ops.segment_sum(
                recv.reshape(-1), sidx.reshape(-1), num_segments=mc
            )
            return yl + add

        spec = P(ROW_AXIS)
        y0 = y if y is not None else jnp.zeros(
            (self.col_partition.n_padded,), ghost_vals.dtype
        )
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(spec, spec, spec, spec),
            out_specs=spec,
        )(self.send_idx, self.recv_map, ghost_vals, y0)

    # -- host round-trip and repartitioning --------------------------------
    def to_csr(self):
        """Reconstruct the global host CSR (strips padding)."""
        from parallel_amg_tpu.ops.coo import COO

        S = self.n_shards
        m = self.row_partition.rows_per_shard
        mc = self.col_partition.rows_per_shard
        n_rows, n_cols = self.true_shape
        dc = np.asarray(self.diag_cols)
        dv = np.asarray(self.diag_vals)
        oc = np.asarray(self.off_cols)
        ov = np.asarray(self.off_vals)
        rs, cs, vs = [], [], []
        for s in range(S):
            # recover ghost gids for shard s from the halo plan
            gids = np.full((self.recv_map.shape[1],), -1, np.int64)
            rmap = np.asarray(self.recv_map[s])
            sidx = np.asarray(self.send_idx)
            C = sidx.shape[2]
            for g, pos in enumerate(rmap):
                if pos < S * C:
                    o, j = divmod(int(pos), C)
                    gids[g] = o * mc + sidx[o, s, j]
            rows = np.arange(s * m, s * m + m)
            dmask = dv != 0
            for r in range(m):
                gr = s * m + r
                if gr >= n_rows:
                    continue
                sel = dv[s, r] != 0
                rs.append(np.full(sel.sum(), gr))
                cs.append(s * mc + dc[s, r][sel])
                vs.append(dv[s, r][sel])
                sel = ov[s, r] != 0
                rs.append(np.full(sel.sum(), gr))
                cs.append(gids[oc[s, r][sel]])
                vs.append(ov[s, r][sel])
        from parallel_amg_tpu.ops.csr import CSR

        rs = np.concatenate(rs) if rs else np.empty(0, np.int64)
        cs = np.concatenate(cs) if cs else np.empty(0, np.int64)
        vs = np.concatenate(vs) if vs else np.empty(0)
        keep = (cs >= 0) & (cs < n_cols)
        return COO(rs[keep], cs[keep], vs[keep], self.true_shape).to_csr()

    def to_triplets(self):
        """Recover per-shard (rows, cols, vals) triplet blocks with GLOBAL
        ids, entirely on device — (S, T) arrays, padding rows = -1.

        Ghost gids are reconstructed with ONE all_to_all of the send tables:
        what I receive from owner o at position j is x_o[send_idx[o, me, j]],
        so gid(slot g) = o·mc + send_idx[o, me, j] with (o, j) = recv_map[g].

        PATTERN-LOSSY: validity is tracked as ``val != 0`` (PCSR stores no
        per-row nnz), so explicitly stored zeros are dropped — a
        triplet-round-tripped matrix has the same values but a possibly
        tighter sparsity pattern than the original.  Numerics are
        unaffected; pattern-sensitive consumers (nnz counts, width sizing,
        strength masks) may see fewer structural entries.
        """
        S = self.n_shards
        m = self.row_partition.rows_per_shard
        mc = self.col_partition.rows_per_shard
        C = self.send_idx.shape[2]
        n_rows = self.true_shape[0]
        Wd = self.diag_cols.shape[2]
        Wo = self.off_cols.shape[2]

        def body(dc, dv, oc, ov, sidx, rmap):
            dc, dv, oc, ov = dc[0], dv[0], oc[0], ov[0]
            sidx, rmap = sidx[0], rmap[0]
            me = jax.lax.axis_index(ROW_AXIS)
            # ghost gid table: all_to_all my send tables; recv[o] is the
            # local-id list I requested from o
            recv = jax.lax.all_to_all(sidx, ROW_AXIS, 0, 0, tiled=True)
            owner_base = (jnp.arange(S) * mc)[:, None] + recv  # (S, C) gids
            gids = jnp.concatenate(
                [owner_base.reshape(-1), jnp.full((1,), -1, jnp.int32)]
            )[rmap]  # (G,) global id per ghost slot (-1 = trash)
            rows_l = jnp.arange(m)
            gr = me * m + rows_l
            live_row = gr < n_rows
            # diag triplets
            r_d = jnp.broadcast_to(gr[:, None], (m, Wd))
            c_d = me * mc + dc
            ok_d = (dv != 0) & live_row[:, None]
            # identity padding rows are structural, drop them
            r_o = jnp.broadcast_to(gr[:, None], (m, Wo))
            c_o = gids[oc]
            ok_o = (ov != 0) & live_row[:, None] & (c_o >= 0)
            rows = jnp.concatenate([
                jnp.where(ok_d, r_d, -1).reshape(-1),
                jnp.where(ok_o, r_o, -1).reshape(-1)])
            cols = jnp.concatenate([
                jnp.where(ok_d, c_d, 0).reshape(-1),
                jnp.where(ok_o, c_o, 0).reshape(-1)])
            vals = jnp.concatenate([
                jnp.where(ok_d, dv, 0).reshape(-1),
                jnp.where(ok_o, ov, 0).reshape(-1)])
            return rows[None], cols[None], vals[None]

        spec = P(ROW_AXIS)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(spec,) * 6,
            out_specs=(spec,) * 3,
        )(self.diag_cols, self.diag_vals, self.off_cols, self.off_vals,
          self.send_idx, self.recv_map)

    def repartition(self, mesh, col_partition: Partition | None = None,
                    dtype=None, rows_per_shard: int | None = None,
                    **device_caps) -> "PCSR":
        """Redistribute rows — the coarse-level repartitioner of
        SURVEY.md §2.1.  Fully on device for both cases:

        - same mesh (re-balance / re-align rows_per_shard): triplet
          recovery (`to_triplets`) + all_to_all owner routing
          (`pcsr_from_coo_device`);
        - CROSS-mesh (e.g. shrink a coarse level to fewer devices): the
          per-shard triplet blocks are re-blocked for the target shard
          count and moved with one resharding ``jax.device_put`` (a
          device-to-device copy — no host-global matrix), then assembled
          on the target mesh.

        Only ``col_partition`` (a bespoke column split) still routes
        through the host rebuild, and that path rejects the device-only
        arguments instead of silently ignoring them.
        """
        if col_partition is not None:
            if rows_per_shard is not None or device_caps:
                raise ValueError(
                    "repartition: rows_per_shard/device capacities are not "
                    "honored by the col_partition host fallback — drop "
                    "col_partition or the device-only arguments")
            return PCSR.from_csr(self.to_csr(), mesh,
                                 col_partition=col_partition,
                                 dtype=dtype or self.diag_vals.dtype)

        from parallel_amg_tpu.parallel.mesh import row_sharding
        from parallel_amg_tpu.parallel.passembly_device import (
            pcsr_from_coo_device,
        )

        rows, cols, vals = self.to_triplets()
        if mesh is not self.mesh:
            S_new = mesh.devices.size
            total = rows.shape[0] * rows.shape[1]
            pad = (-total) % S_new

            def reblock(a, fill):
                flat = a.reshape(-1)
                if pad:
                    flat = jnp.concatenate(
                        [flat, jnp.full((pad,), fill, flat.dtype)])
                return flat.reshape(S_new, -1)

            sh = row_sharding(mesh)
            rows = jax.device_put(reblock(rows, -1), sh)
            cols = jax.device_put(reblock(cols, 0), sh)
            vals = jax.device_put(reblock(vals, 0), sh)
        # a re-aligned ownership boundary can flip any entry between
        # diag and offdiag, so both widths get the full row budget;
        # overflow is loud, not silent, if these ever fall short
        W = self.diag_cols.shape[2] + self.off_cols.shape[2]
        caps = dict(
            ell_width=W, off_width=W,
            ghost_capacity=max(4 * self.recv_map.shape[1], 64),
        )
        caps.update(device_caps)
        return pcsr_from_coo_device(
            rows, cols, vals, self.true_shape, mesh,
            rows_per_shard=rows_per_shard,
            dtype=dtype or self.diag_vals.dtype, **caps)

    def diagonal(self):
        """Main diagonal as a global sharded vector (square matrices)."""
        m = self.row_partition.rows_per_shard
        r_iota = jax.lax.broadcasted_iota(jnp.int32, self.diag_cols.shape, 1)
        hit = (self.diag_cols == r_iota) & (self.diag_vals != 0)
        d = jnp.sum(jnp.where(hit, self.diag_vals, 0.0), axis=-1)  # (S, m)
        return d.reshape(-1)

    def __matmul__(self, x):
        return self.matvec(x)
