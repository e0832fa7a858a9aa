"""HEVM executor: interprets the bytecode stream over the JAX crypto layer.

This is the TPU-native counterpart of the reference's C++ bytecode VM
(lib/Runtime/SEAL_HEVM.cpp:336-401 dispatch loop). Where the reference calls
seal::Evaluator per instruction, we dispatch to crypto.ops.Evaluator — and,
because every instruction is shape-static, the WHOLE program can be traced
once and compiled by XLA into a single TPU executable (`compile()`), which is
the "inverted VM" design: the bytecode becomes one jitted dataflow graph with
buffer reuse handled by XLA.

Runtime metadata ((nl, scale) per register) is tracked on the host exactly
like SEAL tracks ciphertext.scale()/levels, including the reference's
scale-forcing semantics in addcc/addcp (SEAL_HEVM.cpp:297-310).
"""

import numpy as np
import jax
import jax.numpy as jnp

from .hevm import (
    HEVMProgram, OP_ENCODE, OP_ROTATE, OP_NEGATE, OP_RESCALE, OP_MODSWITCH,
    OP_UPSCALE, OP_ADDCC, OP_ADDCP, OP_MULCC, OP_MULCP, OP_BOOTSTRAP, OP_ALLOC,
)
from .fuse import (
    ssa_expand, build_fuse_plan, RotMacOp, OP_ROTMAC, OP_UPRESCALE,
    cipher_reads,
)


class HEVMExecutor:
    def __init__(self, scheme, program: HEVMProgram, constants):
        """scheme: crypto.Scheme with keys; constants: list of f64 arrays (.cst)."""
        self.s = scheme
        self.ev = scheme.ev
        self.rr = scheme.ctx.config.rescale_rows   # RNS rows per hevm level
        self.prog = program
        self.constants = constants
        # SSA-expand the register stream (fuse.py ssa_expand), then fuse the
        # conv rot-mac banks unless disabled (DACAPO_TPU_FUSE=0)
        self.ops, self.num_regs, self.res_dst = ssa_expand(program)
        import os
        if os.environ.get("DACAPO_TPU_FUSE", "1") != "0":
            self.ops, self._fused_pt_regs, self.num_regs = build_fuse_plan(
                self.ops, self.num_regs, self.res_dst)
        else:
            self._fused_pt_regs = set()
        self.plains = [None] * program.num_ptxt      # device planes (or host when streaming)
        self.plain_meta = [None] * program.num_ptxt  # (nl, scale)
        self._pt_cid = [None] * program.num_ptxt     # register -> dedup id
        self._pt_rows = {}                           # cid -> NTT row list
        self._pt_dev = None                          # cid -> device LRU (streaming)
        self._pt_dev_bytes = 0
        self._pt_budget = None
        self._streaming = False
        self._compiled = None
        self._bank_perm_cache = {}   # tuple(steps) -> int32 shifts [K]
        self.debug = False           # per-op (nl, scale) trace (VM setDebug)
        self._set_memory_budgets()
        self._prepare_keys()

    # Device-memory plan: one chip's HBM must hold rotation keys, pre-encoded
    # plaintexts, the ciphertext register file, and XLA workspace. Fractions
    # of the reported HBM limit; host RAM backs the overflow (LRU streamed).
    # Keys get the lion's share: key ACCESS is cyclic (every rotation offset
    # once per run), so an undersized key LRU degenerates to 100% misses at
    # ~30ms H2D each — resident keys are worth far more than resident
    # plaintexts (each plaintext is used once per run anyway).
    KEY_BUDGET_FRAC = 0.55
    PTXT_BUDGET_FRAC = 0.12

    def _hbm_limit(self):
        import jax
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            return int(stats.get("bytes_limit", 0)) or None
        except Exception:
            return None

    def _set_memory_budgets(self):
        import os
        env = os.environ.get("DACAPO_TPU_HBM_BYTES")
        limit = int(env) if env else self._hbm_limit()
        if limit is None:
            # memory_stats unavailable (e.g. remote-tunnel backends): assume a
            # 16GB chip for big-N profiles; override with DACAPO_TPU_HBM_BYTES.
            limit = 16 << 30 if self.s.ctx.n >= (1 << 15) else None
        if limit is None:
            return
        offs = {o for o in self.prog.rotation_offsets() if o != 0}
        key_bytes = len(offs) * self.s.galois_key_bytes()
        if key_bytes > self.KEY_BUDGET_FRAC * limit:
            import sys
            print(f"[hevm] galois keys {key_bytes >> 20} MiB exceed budget "
                  f"{int(self.KEY_BUDGET_FRAC * limit) >> 20} MiB: "
                  "streaming keys from host (LRU)", file=sys.stderr)
            self.s.set_key_budget(int(self.KEY_BUDGET_FRAC * limit))
        self._pt_budget = int(self.PTXT_BUDGET_FRAC * limit)

    def setDebug(self, flag=True):
        """Per-op scale/level tracing like the reference VMs' setDebug
        (SEAL_HEVM.cpp:269-334 prints op name + scale per instruction)."""
        self.debug = bool(flag)

    def _prepare_keys(self):
        offs = [o for o in self.prog.rotation_offsets() if o != 0]
        self.s.ensure_galois(offs)

    # ------------------------------------------------------------ preprocess
    NTT_BATCH = (64, 16, 4, 1)   # plaintexts per batched-NTT launch (per nl)

    def preprocess(self):
        """Pre-encode all plaintexts offline (SEAL_HEVM.cpp:242-267).

        Beyond the reference: (a) payload-identical encodes are DEDUPLICATED
        (privatized constants make CNN masks repeat thousands of times);
        (b) device NTTs are batched per level; (c) if the unique set exceeds
        the device budget, encoded planes stay in host RAM and an LRU window
        of the hottest ones is device-resident (streaming mode); (d) scale
        STEERING (vm/steer.py): plaintexts encode at solver-chosen real
        scales and upscales become integer-K multiplies, so forced-scale
        adds see exactly matching operands despite composite prime-pair
        drift (flagship sim RMS 1.85e-2 -> 2.1e-4). Opt out with
        DACAPO_TPU_STEER=0."""
        import hashlib
        import os

        enc = self.s.encoder
        ctx = self.s.ctx
        alpha = ctx.config.alpha
        self._steer = None
        self._steer_res, self._steer_kf = {}, {}
        if os.environ.get("DACAPO_TPU_STEER", "1") == "1":
            from .steer import steer_scales
            st = self._steer = steer_scales(
                self.prog, [int(q) for q in ctx.q_primes], self.rr,
                ctx.config.prime_bits)
            nq = ctx.config.num_q
            for opi, (k, _nl) in st.up_k.items():
                self._steer_res[opi] = self.ev.scalar_rows(k, nq)
                self._steer_kf[opi] = float(k)
            if st.forced or st.conflicts:
                import sys
                worst = max(map(abs, st.forced.values()), default=0.0)
                print(f"[steer] {len(st.forced)} forced adds "
                      f"(worst dlog2 {worst:.2e}), "
                      f"{len(st.conflicts)} encode conflicts",
                      file=sys.stderr, flush=True)
        uniq = {}          # (rhs, payload digest, scale) -> cid
        cid_info = []      # cid -> (data, nl, scale)
        cid_regs = []      # cid -> [dst regs]
        for opi, op in enumerate(self.prog.ops):
            if op.opcode != OP_ENCODE:
                continue
            level = op.rhs >> 10
            scale = op.rhs & 0x3FF
            nl = (level + 1) * self.rr
            sc = float(2.0 ** scale)
            if self._steer is not None:
                sc = self._steer.enc_scale.get(opi, sc)
            if op.lhs == 0xFFFF:
                data = np.ones(1)
                key = (op.rhs, b"ones", sc)
            else:
                data = np.ascontiguousarray(self.constants[op.lhs])
                key = (op.rhs, hashlib.sha1(data.tobytes()).digest(), sc)
            cid = uniq.get(key)
            if cid is None:
                cid = uniq[key] = len(cid_info)
                cid_info.append((data, nl, sc))
                cid_regs.append([])
            cid_regs[cid].append(op.dst)
            self._pt_cid[op.dst] = cid
            self.plain_meta[op.dst] = (nl, sc)

        # plaintexts feeding fused rot-mac banks need the extended Q^{(nl)}P
        # basis (lazy-ModDown masks): extra `alpha` special-prime rows
        cid_qp = [any(r in self._fused_pt_regs for r in regs)
                  for regs in cid_regs]

        n = self.s.ctx.n
        total_bytes = sum(
            (nl + (alpha if qp else 0)) * n * 4
            for (_, nl, _), qp in zip(cid_info, cid_qp))
        self._streaming = (self._pt_budget is not None
                           and total_bytes > self._pt_budget)
        if self._streaming:
            self._pt_dev = {}
            self._pt_lru = __import__("collections").OrderedDict()

        sp_rows = [ctx.config.num_q + i for i in range(alpha)]
        if self._streaming:
            # COMPACT DEVICE POOL: each unique payload becomes a 2-row
            # integer record (Encoder.encode_compact_batch) resident on
            # device (~8 bytes/coefficient for the WHOLE program); per-use
            # RNS residues + NTT are computed on device (decode_plain).
            # This removes the multi-GB host->device plaintext streaming
            # that dominated big-CNN runs on tunneled TPU setups.
            pool = np.empty((len(cid_info), 2, n), dtype=np.uint32)
            i = 0
            while i < len(cid_info):
                bsz = min(64, len(cid_info) - i)
                pool[i: i + bsz] = enc.encode_compact_batch(
                    [cid_info[c][0] for c in range(i, i + bsz)],
                    [cid_info[c][2] for c in range(i, i + bsz)])
                i += bsz
            self._pt_pool = jnp.asarray(pool)
            for cid in range(len(cid_info)):
                nl = cid_info[cid][1]
                self._pt_rows[cid] = list(range(nl)) + (
                    sp_rows if cid_qp[cid] else [])
                for dst in cid_regs[cid]:
                    self.plains[dst] = cid      # marker: decode from pool
            return

        # non-streaming: host-encode all unique payloads (coeff domain),
        # grouped by (nl, qp-extended) — ONE vectorized FFT per batch
        # (Encoder.encode_batch), then device NTTs in large prime-major
        # batches; everything stays device-resident in NTT form.
        by_grp = {}
        for cid, (data, nl, scale) in enumerate(cid_info):
            by_grp.setdefault((nl, cid_qp[cid]), []).append(cid)
        cid_planes = [None] * len(cid_info)
        for (nl, qp), cids in by_grp.items():
            rows_list = list(range(nl)) + (sp_rows if qp else [])
            primes = ([ctx.primes[r] for r in rows_list]) if qp else None
            nrows = len(rows_list)
            for c in cids:
                self._pt_rows[c] = rows_list
            i = 0
            while i < len(cids):
                bsz = next(b for b in self.NTT_BATCH if b <= len(cids) - i)
                chunk = cids[i: i + bsz]
                blk = enc.encode_batch(
                    [cid_info[c][0] for c in chunk],
                    [cid_info[c][2] for c in chunk], nl,
                    primes=primes)                        # [bsz, nrows, N]
                flat = np.ascontiguousarray(
                    blk.transpose(1, 0, 2)).reshape(bsz * nrows, -1)
                rows = [r for r in rows_list for _ in range(bsz)]
                out = self.ev.ntt(jnp.asarray(flat), rows)
                out = out.reshape(nrows, bsz, -1).transpose(1, 0, 2)
                for k in range(bsz):
                    cid_planes[cids[i + k]] = out[k]
                i += bsz

        for cid, planes in enumerate(cid_planes):
            for dst in cid_regs[cid]:
                self.plains[dst] = planes

    def _pt_insert(self, cid, dev):
        self._pt_dev[cid] = dev
        self._pt_dev_bytes += dev.nbytes
        self._pt_lru[cid] = dev.nbytes
        while (self._pt_dev_bytes > self._pt_budget
               and len(self._pt_lru) > 1):
            old, nb = self._pt_lru.popitem(last=False)
            del self._pt_dev[old]
            self._pt_dev_bytes -= nb

    def _plain(self, plains, idx, nl):
        """Device NTT planes [:nl] for plaintext register `idx`. In
        streaming mode the register holds a pool id; the RNS planes are
        decoded ON DEVICE from the compact pool on first use (LRU-cached
        under the plaintext budget)."""
        p = plains[idx]
        if self._streaming and isinstance(p, (int, np.integer)):
            cid = int(p)
            dev = self._pt_dev.get(cid)
            if dev is None:
                rows = self._pt_rows[cid]
                dev = self.ev.decode_plain(
                    self._pt_pool[cid: cid + 1], rows)[0]
                self._pt_insert(cid, dev)
            else:
                self._pt_lru.move_to_end(cid)
            p = dev
        return p if nl is None else p[:nl]

    PT_BATCH = (32, 8, 2, 1)

    def _plain_prefetch(self, regs):
        """Batch-decode the missing plaintexts of a fused bank from the
        device pool: one launch per chunk instead of per-mask dispatches
        (eager paths only)."""
        if not self._streaming:
            return
        missing = {}
        for r in regs:
            cid = self._pt_cid[r]
            if (cid is None or cid in self._pt_dev
                    or not isinstance(self.plains[r], (int, np.integer))):
                continue
            rows = tuple(self._pt_rows[cid])
            missing.setdefault(rows, set()).add(cid)
        for rows, cidset in missing.items():
            cids = sorted(cidset)
            nr = len(rows)
            i = 0
            while i < len(cids):
                bsz = next(b for b in self.PT_BATCH if b <= len(cids) - i)
                chunk = cids[i: i + bsz]
                block = self._pt_pool[np.asarray(chunk)]
                out = self.ev.decode_plain(block, rows)
                for k, cid in enumerate(chunk):
                    self._pt_insert(cid, out[k])
                i += bsz

    def _plain_rows_qp(self, full, reg, nl):
        """Q^{(nl)}P rows of a QP-encoded plaintext: first nl Q rows plus the
        alpha special rows stored after the encode-level Q rows."""
        nl_enc = self.plain_meta[reg][0]
        alpha = self.s.ctx.config.alpha
        idx = np.r_[0:nl, nl_enc:nl_enc + alpha]
        return full[idx]

    # ------------------------------------------------------------ dispatch
    def _exec_stream(self, ops, ciphers, meta, getplain, getgk, getperm,
                     rlk, out_regs, prefetch=None, getuk=None):
        """Interpret an instruction window over JAX values (eager arrays or
        tracers — the same code serves per-op dispatch, whole-program jit and
        per-segment jit). Mutates `ciphers`/`meta` dicts; returns the arrays
        for `out_regs` (pending rotation banks flushed as needed).

        Rotations are executed LAZILY: every `rotatec` of the same source
        ciphertext joins a pending bank, flushed as ONE hoisted batched
        rotation (Evaluator.rotate_batch) the first time any of its results
        is consumed. Ciphertext arrays are immutable (JAX), so deferral is
        always safe regardless of register reuse.
        """
        ev = self.ev
        if getuk is None:
            getuk = self._getuk_eager

        # pending rotation banks: bank = {"src", "nl", "entries": [(dst, steps)]}
        banks_by_src = {}      # (id(src_array), nl) -> bank
        bank_of_dst = {}       # dst reg -> bank

        def flush(bank):
            entries = bank["entries"]
            nl = bank["nl"]
            steps = tuple(st for _, st in entries)
            shifts = getperm(steps)
            # gks restacked per flush: a cached stack would hold an extra COPY
            # of every member key per distinct bank (OOM at 200+ keys); the
            # device-side restack is bandwidth-cheap and lets the GaloisStore
            # LRU own key residency.
            gks = jnp.stack([getgk(st) for st in steps])
            out = ev.rotate_batch(bank["src"], nl, shifts, gks)
            for k, (dst, _) in enumerate(entries):
                ciphers[dst] = out[k]
                del bank_of_dst[dst]
            banks_by_src.pop(bank["key"], None)

        def materialize(reg):
            bank = bank_of_dst.get(reg)
            if bank is not None:
                flush(bank)
            return ciphers[reg]

        # free values after their last read in THIS window (SSA stream would
        # otherwise hold every intermediate ciphertext live); only window-
        # defined registers are dropped, out_regs always survive
        last_use = {}
        defined = set()
        for i, op in enumerate(ops):
            for r in cipher_reads(op, self.num_regs):
                last_use[r] = i
            if op.opcode not in (OP_ALLOC, OP_ENCODE):
                defined.add(op.rescale_dst if getattr(op, "fold_rescale", False)
                            else op.dst)
        keep = set(out_regs)
        # (src_reg, nl) -> (src_array, digits): hoisted ModUp digits. Keyed by
        # the SSA register (NOT id(src) — release() frees arrays, so a reused
        # id could alias a stale entry); the array is pinned in the entry and
        # identity-checked so bank flushes that rebind a register still miss.
        dig_cache = {}

        def release(op, i):
            for r in cipher_reads(op, self.num_regs):
                if (last_use.get(r) == i and r not in keep and r in defined
                        and r in ciphers and r not in bank_of_dst):
                    del ciphers[r]

        for opi, op in enumerate(ops):
            oc = op.opcode
            if oc in (OP_ALLOC, OP_ENCODE):
                continue
            if oc == OP_ROTMAC:
                if op.src >= 0:
                    nl, ssc = meta[op.src]
                else:
                    nl, ssc = meta[op.plain_vals[0]]
                psc = self.plain_meta[(op.pt_regs or op.plain_pts)[0]][1]
                if prefetch is not None:
                    prefetch(list(op.pt_regs) + list(op.plain_pts))
                extras = [materialize(r) for r in op.extra]
                pvals = [materialize(r) for r in op.plain_vals]
                ppts = [getplain(r, nl) for r in op.plain_pts]
                src = digits = shifts = None
                gks, pts = [], []
                if op.src >= 0:
                    src = materialize(op.src)
                    shifts = getperm(tuple(op.steps))
                    gks = [getgk(st) for st in op.steps]
                    pts = [self._plain_rows_qp(getplain(r, None), r, nl)
                           for r in op.pt_regs]
                    dkey = (op.src, nl)
                    hit = dig_cache.get(dkey)
                    if hit is not None and hit[0] is src:
                        digits = hit[1]
                        dig_cache[dkey] = dig_cache.pop(dkey)  # LRU touch
                    else:
                        digits = ev.modup(src[1], nl)
                        # small LRU: multi-source conv banks interleave their
                        # groups, so one entry would thrash (measured: 1961
                        # ModUps instead of ~13 on ResNet)
                        if len(dig_cache) >= 8:
                            dig_cache.pop(next(iter(dig_cache)))
                        dig_cache[dkey] = (src, digits)
                rs = self.rr if (op.fold_rescale or op.taps_rescaled) else 0
                out = ev.rot_mac(src, nl, shifts, gks, pts, extras,
                                 fold_rescale_rows=rs,
                                 extras_post=op.taps_rescaled, digits=digits,
                                 plain_vals=pvals, plain_pts=ppts)
                sc = ssc * psc
                dst = op.rescale_dst if op.fold_rescale else op.dst
                for _ in range(rs):
                    sc /= self.s.ctx.q_primes[nl - 1]
                    nl -= 1
                ciphers[dst] = out
                meta[dst] = (nl, sc)
                if self.debug:
                    self._dbg_rotmac(op, meta[dst])
                release(op, opi)
                continue
            if oc == OP_ROTATE:
                nl, sc = meta[op.lhs]
                steps = op.rhs
                src = materialize(op.lhs)
                if steps == 0:
                    ciphers[op.dst], meta[op.dst] = src, (nl, sc)
                else:
                    key = (id(src), nl)
                    bank = banks_by_src.get(key)
                    if bank is None:
                        bank = {"key": key, "src": src, "nl": nl, "entries": []}
                        banks_by_src[key] = bank
                    bank["entries"].append((op.dst, steps))
                    bank_of_dst[op.dst] = bank
                    meta[op.dst] = (nl, sc)
                if self.debug:
                    self._dbg(op, meta[op.dst])
                release(op, opi)
                continue
            if op.lhs < self.num_regs:
                materialize(op.lhs)
            if oc in (OP_ADDCC, OP_MULCC) and op.rhs < self.num_regs:
                materialize(op.rhs)
            if oc == OP_NEGATE:
                nl, sc = meta[op.lhs]
                ciphers[op.dst] = ev.neg_ct(ciphers[op.lhs], nl)
                meta[op.dst] = (nl, sc)
            elif oc == OP_RESCALE:
                nl, sc = meta[op.lhs]
                ciphers[op.dst] = ev.rescale_k(ciphers[op.lhs], nl, self.rr)
                for _ in range(self.rr):        # composite: drop the pair
                    sc /= self.s.ctx.q_primes[nl - 1]
                    nl -= 1
                meta[op.dst] = (nl, sc)
            elif oc == OP_MODSWITCH:
                nl, sc = meta[op.lhs]
                ciphers[op.dst] = ev.mod_drop(ciphers[op.lhs], op.rhs * self.rr)
                meta[op.dst] = (nl - op.rhs * self.rr, sc)
            elif oc == OP_UPSCALE:
                nl, sc = meta[op.lhs]
                ciphers[op.dst] = ev.upscale_res(
                    ciphers[op.lhs], nl, getuk(op)[:, :nl])
                meta[op.dst] = (nl, sc * self._upk(op))
            elif oc == OP_UPRESCALE:
                nl, sc = meta[op.lhs]
                ciphers[op.dst] = ev.upscale_rescale_res(
                    ciphers[op.lhs], nl, getuk(op)[:, :nl], self.rr)
                sc *= self._upk(op)
                for _ in range(self.rr):
                    sc /= self.s.ctx.q_primes[nl - 1]
                    nl -= 1
                meta[op.dst] = (nl, sc)
            elif oc == OP_ADDCC:
                nl, _ = meta[op.lhs]
                _, sc = meta[op.rhs]  # SEAL forces lhs.scale = rhs.scale
                ciphers[op.dst] = ev.add_ct(ciphers[op.lhs], ciphers[op.rhs], nl)
                meta[op.dst] = (nl, sc)
            elif oc == OP_ADDCP:
                nl, _ = meta[op.lhs]
                _, psc = self.plain_meta[op.rhs]
                ciphers[op.dst] = ev.add_pt(
                    ciphers[op.lhs], getplain(op.rhs, nl), nl)
                meta[op.dst] = (nl, psc)
            elif oc == OP_MULCC:
                nl, sa = meta[op.lhs]
                _, sb = meta[op.rhs]
                ciphers[op.dst] = ev.mul_ct(ciphers[op.lhs], ciphers[op.rhs], nl, rlk)
                meta[op.dst] = (nl, sa * sb)
            elif oc == OP_MULCP:
                nl, sa = meta[op.lhs]
                _, psc = self.plain_meta[op.rhs]
                ciphers[op.dst] = ev.mul_pt(
                    ciphers[op.lhs], getplain(op.rhs, nl), nl)
                meta[op.dst] = (nl, sa * psc)
            elif oc == OP_BOOTSTRAP:
                nl, sc = meta[op.lhs]
                ciphers[op.dst], meta[op.dst] = self._bootstrap(
                    ciphers[op.lhs], nl, sc, op.rhs)
            else:
                raise ValueError(f"bad opcode {oc}")
            if self.debug:
                self._dbg(op, meta[op.dst])
            release(op, opi)

        return [materialize(r) for r in out_regs]

    def _getperm_eager(self, steps):
        shifts = self._bank_perm_cache.get(steps)
        if shifts is None:
            shifts = self._bank_perm_cache[steps] = jnp.asarray(
                steps, dtype=jnp.int32)
        return shifts

    # --------------------------------------------- upscale multiplier args
    # Upscale multiplies by an integer K passed as a [2, num_q] (residue,
    # shoup) ARGUMENT: K = 2^up_bits, or the steering pass's corrected
    # integer (vm/steer.py). Argument-passed (never baked) so one compiled
    # window serves structurally-equal windows with different Ks.
    def _upk(self, op):
        """The float multiplier of an upscale op (meta bookkeeping)."""
        kf = getattr(self, "_steer_kf", None)
        if kf is not None and op.orig in kf:
            return kf[op.orig]
        return float(2.0 ** op.rhs)

    def _uk_host(self, op):
        res = getattr(self, "_steer_res", None)
        if res is not None and op.orig in res:
            return res[op.orig]
        cache = getattr(self, "_uk_p2_cache", None)
        if cache is None:
            cache = self._uk_p2_cache = {}
        arr = cache.get(op.rhs)
        if arr is None:
            arr = cache[op.rhs] = self.ev.scalar_rows(
                1 << op.rhs, self.s.ctx.config.num_q)
        return arr

    def _getuk_eager(self, op):
        cache = getattr(self, "_uk_dev_cache", None)
        if cache is None:
            cache = self._uk_dev_cache = {}
        key = op.orig if op.orig in getattr(self, "_steer_res", {}) \
            else ("p2", op.rhs)
        arr = cache.get(key)
        if arr is None:
            arr = cache[key] = jnp.asarray(self._uk_host(op))
        return arr

    def _seg_uks_arg(self, info):
        """Per-window upscale-multiplier argument list (window op order)."""
        return [self._getuk_eager(op) for op in info["ops"]
                if op.opcode in (OP_UPSCALE, OP_UPRESCALE)]

    def _run_trace(self, arg_cts, plains):
        """Full-program interpretation (eager per-op dispatch, or traced as
        one computation under the whole-program jit)."""
        ciphers = {}
        meta = {}
        for i, (data, nl, scale) in enumerate(arg_cts):
            ciphers[i] = data
            meta[i] = (nl, scale)
        outs = self._exec_stream(
            self.ops, ciphers, meta,
            getplain=lambda idx, nl: self._plain(plains, idx, nl),
            getgk=lambda st: self.s.keys.galois[st],
            getperm=self._getperm_eager,
            rlk=self.s.keys.rlk,
            out_regs=self.res_dst,
            prefetch=self._plain_prefetch,
        )
        out_meta = [meta[r] for r in self.res_dst]
        return outs, out_meta

# ------------------------------------------------------------ segment jit
    # Maximal bootstrap-free instruction windows compile into SINGLE XLA
    # programs (plaintexts, galois keys, perm tables and the twiddle pack all
    # passed as arguments, so program size is table-independent). This is the
    # "inverted VM" at scale: the reference dispatches one seal::Evaluator
    # call per instruction (SEAL_HEVM.cpp:336-401); here a whole CNN block
    # becomes one fused device program, killing per-op dispatch latency.
    SEGMENT_MAX_OPS = int(__import__("os").environ.get(
        "DACAPO_TPU_SEG_OPS", "96"))   # split long windows (compile-time bound)
    SEGMENT_MIN_OPS = 4        # below this, eager dispatch is cheaper
    SYNC_EVERY = int(__import__("os").environ.get(
        "DACAPO_TPU_SYNC_EVERY", "6"))   # windows between dispatch syncs

    def _segment_plan(self):
        """Split the (SSA, fused) program into windows; compute per-window
        live-in/out cipher registers and resources (plain regs, rotation
        offsets). A fused rot-mac bank counts as one op but carries its own
        rotation-offset/plaintext lists."""
        if getattr(self, "_seg_plan", None) is not None:
            return self._seg_plan
        windows = []
        cur = []

        def close():
            if cur:
                windows.append(("seg", list(cur)))
                cur.clear()

        for op in self.ops:
            if op.opcode in (OP_ALLOC, OP_ENCODE):
                continue
            if op.opcode == OP_BOOTSTRAP:
                close()
                windows.append(("boot", [op]))
            else:
                cur.append(op)
                if len(cur) >= self.SEGMENT_MAX_OPS:
                    close()
        close()

        infos = []
        for kind, ops in windows:
            reads, writes = [], set()
            plain_regs, rot_steps = [], []
            has_mulcc = False
            for op in ops:
                for r in cipher_reads(op, self.num_regs):
                    if r not in writes and r not in reads:
                        reads.append(r)
                if op.opcode == OP_ROTMAC:
                    for r in list(op.pt_regs) + list(op.plain_pts):
                        if r not in plain_regs:
                            plain_regs.append(r)
                    for st in op.steps:
                        if st not in rot_steps:
                            rot_steps.append(st)
                    writes.add(op.rescale_dst if op.fold_rescale else op.dst)
                    continue
                if op.opcode in (OP_ADDCP, OP_MULCP):
                    if op.rhs not in plain_regs:
                        plain_regs.append(op.rhs)
                if op.opcode == OP_ROTATE and op.rhs != 0:
                    if op.rhs not in rot_steps:
                        rot_steps.append(op.rhs)
                if op.opcode == OP_MULCC:
                    has_mulcc = True
                writes.add(op.dst)
            infos.append(dict(kind=kind, ops=ops, ins=reads, writes=writes,
                              plain_regs=plain_regs, rot_steps=rot_steps,
                              has_mulcc=has_mulcc))

        live = set(self.res_dst)
        for info in reversed(infos):
            # canonical (definition-order) output ordering: windows with the
            # same STRUCTURE but different register numbers then agree
            # positionally, which lets them share one compiled function
            def_order = {}
            for i, op in enumerate(info["ops"]):
                d = op.rescale_dst if getattr(op, "fold_rescale", False) \
                    else op.dst
                def_order.setdefault(d, i)
            info["outs"] = sorted(info["writes"] & live,
                                  key=lambda r: def_order.get(r, 1 << 30))
            live = (live - info["writes"]) | set(info["ins"])
        self._seg_plan = infos
        self._seg_fns = {}
        return infos

    @staticmethod
    def _meta_key(in_meta):
        """Hashable form of the input metadata — the trace bakes nl/scale in,
        so a run with different arg levels/scales must retrace, not reuse."""
        return tuple(sorted(in_meta.items()))

    def _seg_struct_key(self, info, in_meta):
        """Canonical STRUCTURAL identity of a window: opcodes + dataflow with
        registers renumbered in first-appearance order, rotation steps and
        plaintexts by within-window position, levels (shapes) included,
        scales excluded (host-metadata only — they never reach the HLO).

        Windows from repeated model blocks (ResNet stages) hash equal and
        share ONE compiled function: argument lists are built in the same
        canonical order on both sides, so fn(A-args) and fn(B-args) compute
        the same program on each window's own data. Measured: 86 ResNet
        windows -> a handful of distinct compiles."""
        ins = info["ins"]
        rot_ix = {st: i for i, st in enumerate(info["rot_steps"])}
        pt_ix = {r: i for i, r in enumerate(info["plain_regs"])}
        m = {}

        def reg(r):
            if r not in m:
                m[r] = len(m)
            return m[r]

        for r in ins:
            reg(r)
        items = [tuple((reg(r), in_meta[r][0]) for r in ins),
                 ("ptmode", self._pt_ingraph())]
        items.append(tuple(
            (self.plain_meta[r][0], r in self._fused_pt_regs)
            for r in info["plain_regs"]))
        for op in info["ops"]:
            if op.opcode == OP_ROTMAC:
                items.append((
                    "rm", reg(op.src) if op.src >= 0 else -1,
                    tuple(rot_ix[st] for st in op.steps),
                    tuple(pt_ix[r] for r in op.pt_regs),
                    tuple(reg(r) for r in op.extra),
                    tuple(reg(r) for r in op.plain_vals),
                    tuple(pt_ix[r] for r in op.plain_pts),
                    bool(op.fold_rescale), bool(op.taps_rescaled),
                    reg(op.rescale_dst if op.fold_rescale else op.dst)))
            elif op.opcode == OP_ROTATE:
                items.append(("rot", reg(op.lhs),
                              rot_ix[op.rhs] if op.rhs != 0 else -1,
                              reg(op.dst)))
            elif op.opcode == OP_UPRESCALE:
                items.append(("uprs", reg(op.lhs), op.up_bits, reg(op.dst)))
            else:
                rhs = op.rhs
                if op.opcode in (OP_ADDCC, OP_MULCC):
                    rhs = reg(op.rhs)
                elif op.opcode in (OP_ADDCP, OP_MULCP):
                    rhs = pt_ix[op.rhs]
                elif op.opcode in (OP_NEGATE, OP_RESCALE):
                    rhs = 0
                items.append((op.opcode, reg(op.lhs), rhs, reg(op.dst)))
        items.append(tuple(reg(r) for r in info["outs"]))
        return tuple(items)

    def _pt_ingraph(self):
        """In-graph plaintext decode: segment functions take COMPACT pool
        records ([k, 2, N] per row-group) and run decode_plain INSIDE the
        traced window. Removes ~dozens of host-side decode dispatches + the
        LRU (whose cyclic access pattern made it all-miss on CNN runs) per
        window, and reads 2 rows/mask from HBM instead of nl+alpha decoded
        rows. Streaming mode only; opt out with DACAPO_TPU_PT_INGRAPH=0."""
        import os
        flag = getattr(self, "_pt_ingraph_flag", None)
        if flag is None:
            flag = self._pt_ingraph_flag = (
                self._streaming
                and os.environ.get("DACAPO_TPU_PT_INGRAPH", "1") == "1")
        return flag

    def _seg_pt_groups(self, info):
        """The window's plaintext regs grouped by decode row tuple (cached
        on the window info). Deterministic ordering — part of the window
        structure (derivable from the per-reg (nl, fused) items already in
        _seg_struct_key)."""
        groups = info.get("pt_groups")
        if groups is None:
            by_rows = {}
            for r in info["plain_regs"]:
                rows = tuple(self._pt_rows[self._pt_cid[r]])
                by_rows.setdefault(rows, []).append(r)
            groups = info["pt_groups"] = sorted(by_rows.items())
            info["pt_group_cids"] = [
                np.asarray([self._pt_cid[r] for r in regs])
                for _, regs in groups]
        return groups

    def _seg_fn(self, wi, info, in_meta):
        """Build (cached) the jitted function for this window's STRUCTURE
        at this input metadata (structurally identical windows share it)."""
        key = self._seg_struct_key(info, in_meta)
        fn = self._seg_fns.get(key)
        if fn is not None:
            return fn
        ops = info["ops"]
        ins = list(info["ins"])
        outs = list(info["outs"])
        plain_regs = list(info["plain_regs"])
        rot_steps = list(info["rot_steps"])
        perm_ix = {st: i for i, st in enumerate(rot_steps)}
        meta0 = dict(in_meta)   # captured: metadata is input-independent
        ingraph = self._pt_ingraph()
        groups = self._seg_pt_groups(info) if ingraph else None

        ups_ops = [op for op in ops
                   if op.opcode in (OP_UPSCALE, OP_UPRESCALE)]

        def f(in_cts, plains_l, gks_l, perms_arr, uks_l, rlk, pk):
            with self.ev.use_pack(pk):
                ciphers = dict(zip(ins, in_cts))
                meta = dict(meta0)
                if ingraph:
                    plain_by_reg = {}
                    for (rows, regs), blk in zip(groups, plains_l):
                        dec = self.ev._decode_plain(blk, rows, pk)
                        for i, r in enumerate(regs):
                            plain_by_reg[r] = dec[i]
                else:
                    plain_by_reg = dict(zip(plain_regs, plains_l))
                gk_by_step = dict(zip(rot_steps, gks_l))
                uk_by_op = {id(o): a for o, a in zip(ups_ops, uks_l)}

                def getperm(steps):
                    idx = np.asarray([perm_ix[st] for st in steps], np.int32)
                    return perms_arr[idx]

                return self._exec_stream(
                    ops, ciphers, meta,
                    getplain=lambda idx, nl: plain_by_reg[idx][:nl],
                    getgk=lambda st: gk_by_step[st],
                    getperm=getperm,
                    rlk=rlk, out_regs=outs,
                    getuk=lambda o: uk_by_op[id(o)],
                )

        fn = self._seg_fns[key] = jax.jit(f)
        return fn

    def _seg_plains_arg(self, info):
        """The plaintext argument list for one window call: compact pool
        blocks (in-graph mode) or decoded device planes (legacy)."""
        if self._pt_ingraph():
            self._seg_pt_groups(info)
            return [self._pt_pool[idx] for idx in info["pt_group_cids"]]
        self._plain_prefetch(info["plain_regs"])
        return [self._plain(self.plains, r, None) for r in info["plain_regs"]]

    def precompile_segments(self, arg_meta=None, max_workers=None):
        """Compile every distinct segment-window structure BEFORE the first
        run. The (nl, scale) metadata walk is pure host logic, so each
        window's jit signature is known ahead of the first execution;
        tracing stays serial (the Evaluator pack-override is instance
        state, not thread-safe), while the expensive XLA compilations fan
        out over a thread pool — and every result lands in the persistent
        compile cache, which the first real run then hits. Cuts cold
        warmup from sum(compile_i) to ~sum(trace_i) + max(compile_i).

        arg_meta: [(nl, scale)] per program argument; defaults to the
        compiled arg_level/arg_scale metadata (what setInput produces).
        Returns the number of distinct structures compiled."""
        import concurrent.futures as cf

        if arg_meta is None:
            arg_meta = [
                ((self.prog.arg_level[i] + 1) * self.rr,
                 float(2.0 ** self.prog.arg_scale[i]))
                for i in range(self.prog.arg_length)]
        plan = self._segment_plan()
        meta = {i: m for i, m in enumerate(arg_meta)}
        n = self.s.ctx.n
        u32 = jnp.uint32
        jobs, seen = [], set()
        for wi, info in enumerate(plan):
            if info["kind"] != "boot" and len(info["ops"]) >= self.SEGMENT_MIN_OPS:
                in_meta = {r: meta[r] for r in info["ins"]}
                key = self._seg_struct_key(info, in_meta)
                if key not in seen:
                    seen.add(key)
                    jobs.append((wi, info, in_meta))
            for op in info["ops"]:
                self._meta_step(op, meta)
        if not jobs:
            return 0
        rlk_sds = jax.ShapeDtypeStruct(self.s.keys.rlk.shape, u32)
        pk = self.ev.pack()
        lowered = []
        for wi, info, in_meta in jobs:
            fn = self._seg_fn(wi, info, in_meta)
            in_cts = [jax.ShapeDtypeStruct((2, in_meta[r][0], n), u32)
                      for r in info["ins"]]
            if self._pt_ingraph():
                plains_l = [jax.ShapeDtypeStruct((len(regs), 2, n), u32)
                            for _, regs in self._seg_pt_groups(info)]
            else:
                plains_l = [jax.ShapeDtypeStruct(
                    (len(self._pt_rows[self._pt_cid[r]]), n), u32)
                    for r in info["plain_regs"]]
            gks_l = [rlk_sds] * len(info["rot_steps"])
            perms = jnp.asarray(info["rot_steps"], dtype=jnp.int32)
            uk_sds = jax.ShapeDtypeStruct((2, self.s.ctx.config.num_q), u32)
            uks_l = [uk_sds] * sum(
                1 for op in info["ops"]
                if op.opcode in (OP_UPSCALE, OP_UPRESCALE))
            lowered.append(
                (wi, fn.lower(in_cts, plains_l, gks_l, perms, uks_l,
                              rlk_sds, pk)))

        import sys
        import time as _t
        times = {}

        def _compile(job):
            wi, lo = job
            t0 = _t.perf_counter()
            lo.compile()
            times[wi] = _t.perf_counter() - t0

        with cf.ThreadPoolExecutor(max_workers or min(8, len(lowered))) as pool:
            list(pool.map(_compile, lowered))
        if times:
            ts = sorted(times.values())
            print(f"[precompile] {len(ts)} structs: per-compile "
                  f"min {ts[0]:.1f}s median {ts[len(ts)//2]:.1f}s "
                  f"max {ts[-1]:.1f}s sum {sum(ts):.1f}s "
                  f"(threaded wall is lower)", file=sys.stderr, flush=True)
        return len(lowered)

    @staticmethod
    def _rss_gb():
        try:
            with open("/proc/self/statm") as f:
                return round(int(f.read().split()[1]) * 4096 / 2 ** 30, 2)
        except Exception:
            return -1.0

    def set_profiling(self, flag=True):
        """Per-segment wall-clock attribution for the segmented runner.
        Adds a device sync after every window (slightly perturbs total time
        but makes each line honest); results in self.seg_profile, printed
        by seg_report(). Also on via DACAPO_TPU_SEGPROF=1."""
        self._segprof = bool(flag)

    def seg_report(self, file=None):
        import sys
        f = file or sys.stderr
        prof = getattr(self, "seg_profile", None)
        if not prof:
            return
        tot = sum(p["s"] for p in prof)
        by_kind = {}
        for p in prof:
            k = by_kind.setdefault(p["kind"], [0.0, 0])
            k[0] += p["s"]
            k[1] += 1
        print(f"[segprof] total {tot:.2f}s over {len(prof)} windows", file=f)
        for kind, (s, n) in sorted(by_kind.items(), key=lambda kv: -kv[1][0]):
            print(f"[segprof]   {kind:<6} {s:8.2f}s  x{n}", file=f)
        for p in sorted(prof, key=lambda p: -p["s"])[:12]:
            print(f"[segprof]   top: w{p['wi']:<3} {p['kind']:<6} "
                  f"{p['ops']:>3} ops  {p['s']:.3f}s  rss={p.get('rss', -1)}G",
                  file=f)
        if prof:
            print(f"[segprof]   host rss: start {prof[0].get('rss', -1)}G "
                  f"end {prof[-1].get('rss', -1)}G", file=f)

    def _run_segmented(self, arg_cts):
        """Execute via per-segment jit: device-side fusion of every
        bootstrap-free window, host round-trips only at (emulated)
        bootstrap boundaries."""
        import os
        import time as _time
        plan = self._segment_plan()
        profiling = getattr(self, "_segprof", None)
        if profiling is None:
            profiling = os.environ.get("DACAPO_TPU_SEGPROF", "0") == "1"
        prof = []
        self.seg_profile = prof if profiling else None
        ciphers = {}
        meta = {}
        for i, (data, nl, scale) in enumerate(arg_cts):
            ciphers[i] = jnp.asarray(data)
            meta[i] = (nl, scale)
        rlk = self.s.keys.rlk
        pk = self.ev.pack()
        for wi, info in enumerate(plan):
            t0 = _time.perf_counter() if profiling else 0.0

            def _rec(kind, *sync):
                if profiling:
                    for v in sync:
                        jax.block_until_ready(v)
                    prof.append(dict(wi=wi, kind=kind, ops=len(info["ops"]),
                                     s=_time.perf_counter() - t0,
                                     rss=self._rss_gb()))

            if info["kind"] == "boot":
                op = info["ops"][0]
                nl, sc = meta[op.lhs]
                ciphers[op.dst], meta[op.dst] = self._bootstrap(
                    ciphers[op.lhs], nl, sc, op.rhs)
                _rec("boot", ciphers[op.dst])
                continue
            if len(info["ops"]) < self.SEGMENT_MIN_OPS:
                # eager dispatch for tiny tails (mutates ciphers in place;
                # out_regs forces pending rotation banks to flush)
                self._exec_stream(
                    info["ops"], ciphers, meta,
                    getplain=lambda idx, nl: self._plain(self.plains, idx, nl),
                    getgk=lambda st: self.s.keys.galois[st],
                    getperm=self._getperm_eager,
                    rlk=rlk, out_regs=info["outs"],
                    prefetch=self._plain_prefetch,
                )
                _rec("eager", *[ciphers[r] for r in info["outs"]
                                if r in ciphers])
                continue
            in_meta = {r: meta[r] for r in info["ins"]}
            fn = self._seg_fn(wi, info, in_meta)
            in_cts = [ciphers[r] for r in info["ins"]]
            plains_l = self._seg_plains_arg(info)
            gks_l = [self.s.keys.galois[st] for st in info["rot_steps"]]
            perms_arr = jnp.asarray(info["rot_steps"], dtype=jnp.int32)
            uks_l = self._seg_uks_arg(info)
            out_cts = fn(in_cts, plains_l, gks_l, perms_arr, uks_l, rlk, pk)
            # host-side metadata walk for the window
            for op in info["ops"]:
                self._meta_step(op, meta)
            for r, v in zip(info["outs"], out_cts):
                ciphers[r] = v
            _rec("seg", *out_cts)
            # dispatch throttle: with the device-resident oracle there are
            # no natural sync points left, and enqueueing the WHOLE program
            # pins every host-side upload (streamed keys/plaintexts) of every
            # in-flight window — measured 130 GB host RSS -> OOM on the
            # tunneled backend. One sync every few windows bounds in-flight
            # memory at negligible latency cost.
            if not profiling and out_cts and (wi % self.SYNC_EVERY
                                              == self.SYNC_EVERY - 1):
                jax.block_until_ready(out_cts[-1])
        outs = [ciphers[r] for r in self.res_dst]
        out_meta = [meta[r] for r in self.res_dst]
        if profiling:
            self.seg_report()
        return outs, out_meta

    # --------------------------------------------------------- batch / mesh
    # Multi-chip execution (SURVEY §7 step 9): a BATCH of ciphertexts runs
    # through the same compiled program, vmapping each cached segment
    # function. Over a jax Mesh, batch rows shard across "dp" and RNS limb
    # planes across "mp" (parallel/mesh.py shardings); keys/plaintexts/pack
    # are device_put replicated and GSPMD inserts the collectives.
    def _seg_fn_batch(self, wi, info, in_meta):
        if getattr(self, "_seg_fns_batch", None) is None:
            self._seg_fns_batch = {}
        key = self._seg_struct_key(info, in_meta)
        fn = self._seg_fns_batch.get(key)
        if fn is not None:
            return fn
        ops = info["ops"]
        ins = list(info["ins"])
        outs = list(info["outs"])
        plain_regs = list(info["plain_regs"])
        rot_steps = list(info["rot_steps"])
        perm_ix = {st: i for i, st in enumerate(rot_steps)}
        meta0 = dict(in_meta)

        ups_ops = [op for op in ops
                   if op.opcode in (OP_UPSCALE, OP_UPRESCALE)]

        def f(in_cts, plains_l, gks_l, perms_arr, uks_l, rlk, pk):
            with self.ev.use_pack(pk):
                ciphers = dict(zip(ins, in_cts))
                meta = dict(meta0)
                plain_by_reg = dict(zip(plain_regs, plains_l))
                gk_by_step = dict(zip(rot_steps, gks_l))
                uk_by_op = {id(o): a for o, a in zip(ups_ops, uks_l)}

                def getperm(steps):
                    idx = np.asarray([perm_ix[st] for st in steps], np.int32)
                    return perms_arr[idx]

                return self._exec_stream(
                    ops, ciphers, meta,
                    getplain=lambda idx, nl: plain_by_reg[idx][:nl],
                    getgk=lambda st: gk_by_step[st],
                    getperm=getperm,
                    rlk=rlk, out_regs=outs,
                    getuk=lambda o: uk_by_op[id(o)],
                )

        fb = jax.vmap(f, in_axes=(0, None, None, None, None, None, None))
        fn = self._seg_fns_batch[key] = jax.jit(fb)
        return fn

    def run_encrypted_batch(self, arg_cts, mesh=None):
        """Batched server entry: arg_cts = [(data [B, 2, nl, N], nl, scale)].

        mesh: optional jax Mesh with axes ("dp", "mp") — batch rows shard
        over dp, limb planes over mp. Returns (outs [each [B, 2, nl, N]],
        out_meta) in _last_outputs like run_encrypted."""
        from ..parallel.mesh import batch_sharding, key_sharding, replicated

        def put_batch(x):
            x = jnp.asarray(x)
            if mesh is None:
                return x
            return jax.device_put(x, batch_sharding(mesh))

        def put_rep(x):
            if mesh is None:
                return jnp.asarray(x) if not hasattr(x, "sharding") else x
            return jax.device_put(x, replicated(mesh, jnp.ndim(x)))

        def put_key(x):
            # [dnum, 2, rows, N]: rows shard over mp when divisible — each
            # chip then holds rows/mp of every rotation key instead of a
            # full replica (see parallel/mesh.py key_sharding)
            if mesh is None:
                return jnp.asarray(x) if not hasattr(x, "sharding") else x
            return jax.device_put(x, key_sharding(mesh, rows=x.shape[2]))

        plan = self._segment_plan()
        ciphers = {}
        meta = {}
        for i, (data, nl, scale) in enumerate(arg_cts):
            ciphers[i] = put_batch(data)
            meta[i] = (nl, scale)
        rlk = put_key(self.s.keys.rlk)
        pk = jax.tree.map(put_rep, self.ev.pack())
        for wi, info in enumerate(plan):
            if info["kind"] == "boot":
                op = info["ops"][0]
                nl, sc = meta[op.lhs]
                from ..crypto.bootstrap import Bootstrapper
                bs = getattr(self, "_bs", None)
                if bs is None:
                    bs = self._bs = Bootstrapper(self.s)
                if hasattr(bs, "bootstrap_batch"):
                    out, m2 = bs.bootstrap_batch(
                        np.asarray(ciphers[op.lhs]), nl, sc, op.rhs)
                    ciphers[op.dst] = put_batch(out)
                else:
                    rows = []
                    for b in range(ciphers[op.lhs].shape[0]):
                        out, m2 = self._bootstrap(
                            ciphers[op.lhs][b], nl, sc, op.rhs)
                        rows.append(out)
                    ciphers[op.dst] = put_batch(jnp.stack(rows))
                meta[op.dst] = m2
                continue
            in_meta = {r: meta[r] for r in info["ins"]}
            fn = self._seg_fn_batch(wi, info, in_meta)
            in_cts = [ciphers[r] for r in info["ins"]]
            plains_l = [put_rep(self._plain(self.plains, r, None))
                        for r in info["plain_regs"]]
            gks_l = [put_key(self.s.keys.galois[st]) for st in info["rot_steps"]]
            perms_arr = put_rep(jnp.asarray(info["rot_steps"], dtype=jnp.int32))
            uks_l = [put_rep(a) for a in self._seg_uks_arg(info)]
            out_cts = fn(in_cts, plains_l, gks_l, perms_arr, uks_l, rlk, pk)
            for op in info["ops"]:
                self._meta_step(op, meta)
            for r, v in zip(info["outs"], out_cts):
                ciphers[r] = v
        outs = [ciphers[r] for r in self.res_dst]
        out_meta = [meta[r] for r in self.res_dst]
        self._last_outputs = (outs, out_meta)
        return self._last_outputs

    def _meta_step(self, op, meta):
        """Metadata transition of one op (mirrors _exec_stream bookkeeping)."""
        oc = op.opcode
        if oc in (OP_ALLOC, OP_ENCODE):
            return
        if oc == OP_UPRESCALE:
            nl, sc = meta[op.lhs]
            sc *= self._upk(op)
            for _ in range(self.rr):
                sc /= self.s.ctx.q_primes[nl - 1]
                nl -= 1
            meta[op.dst] = (nl, sc)
            return
        if oc == OP_ROTMAC:
            if op.src >= 0:
                nl, ssc = meta[op.src]
            else:
                nl, ssc = meta[op.plain_vals[0]]
            sc = ssc * self.plain_meta[(op.pt_regs or op.plain_pts)[0]][1]
            dst = op.rescale_dst if op.fold_rescale else op.dst
            if op.fold_rescale or op.taps_rescaled:
                for _ in range(self.rr):
                    sc /= self.s.ctx.q_primes[nl - 1]
                    nl -= 1
            meta[dst] = (nl, sc)
            return
        if oc in (OP_ROTATE, OP_NEGATE):
            meta[op.dst] = meta[op.lhs]
        elif oc == OP_RESCALE:
            nl, sc = meta[op.lhs]
            for _ in range(self.rr):
                sc /= self.s.ctx.q_primes[nl - 1]
                nl -= 1
            meta[op.dst] = (nl, sc)
        elif oc == OP_MODSWITCH:
            nl, sc = meta[op.lhs]
            meta[op.dst] = (nl - op.rhs * self.rr, sc)
        elif oc == OP_UPSCALE:
            nl, sc = meta[op.lhs]
            meta[op.dst] = (nl, sc * self._upk(op))
        elif oc == OP_ADDCC:
            meta[op.dst] = (meta[op.lhs][0], meta[op.rhs][1])
        elif oc == OP_ADDCP:
            meta[op.dst] = (meta[op.lhs][0], self.plain_meta[op.rhs][1])
        elif oc == OP_MULCC:
            meta[op.dst] = (meta[op.lhs][0], meta[op.lhs][1] * meta[op.rhs][1])
        elif oc == OP_MULCP:
            meta[op.dst] = (meta[op.lhs][0],
                            meta[op.lhs][1] * self.plain_meta[op.rhs][1])
        elif oc == OP_BOOTSTRAP:
            # Contract: BOTH runtime bootstrappers are scale-preserving
            # (emulated: reheat after the cooled CRT lift, bootstrap.py;
            # native: StC target scale forced to scale_orig*q0/delta,
            # bootstrap_native.py) — matching the Earth IR type rule
            # (ir/earth.py infer_type "bootstrap" switches level only).
            # precompile_segments walks the program with THIS rule before
            # any run, and _seg_struct_key excludes scales, so the baked
            # meta0 in precompiled closures is only faithful while the
            # runtime return agrees with this prediction.
            nl, sc = meta[op.lhs]
            meta[op.dst] = ((op.rhs + 1) * self.rr, sc)

    _OPNAMES = {
        OP_ENCODE: "encode", OP_ROTATE: "rotatec", OP_NEGATE: "negatec",
        OP_RESCALE: "rescalec", OP_MODSWITCH: "modswitchc",
        OP_UPSCALE: "upscalec", OP_ADDCC: "addcc", OP_ADDCP: "addcp",
        OP_MULCC: "mulcc", OP_MULCP: "mulcp", OP_BOOTSTRAP: "bootstrapc",
    }

    def _dbg_rotmac(self, op, m):
        import math, sys
        nl, sc = m
        print(f"[hevm] rot_mac    dst={op.rescale_dst if op.fold_rescale else op.dst:<5} "
              f"src={op.src:<5} taps={len(op.steps):<4} level={nl - 1:<3} "
              f"log2(scale)={math.log2(sc):.3f}", file=sys.stderr)

    def _dbg(self, op, m):
        import math, sys
        nl, sc = m
        name = self._OPNAMES.get(op.opcode, f"op{op.opcode}")
        print(f"[hevm] {name:<10} dst={op.dst:<5} lhs={op.lhs:<5} "
              f"rhs={op.rhs:<6} level={nl - 1:<3} "
              f"log2(scale)={math.log2(sc):.3f}", file=sys.stderr)

    def _bootstrap(self, data, nl, scale, target_level):
        from ..crypto.bootstrap import Bootstrapper
        bs = getattr(self, "_bs", None)
        if bs is None:
            bs = self._bs = Bootstrapper(self.s)
        return bs.bootstrap(data, nl, scale, target_level)

    # ------------------------------------------------------------- frontends
    WHOLE_JIT_MAX_OPS = 48   # above this, monolithic XLA compile doesn't pay

    def run(self, arg_values, jit="auto"):
        """arg_values: list of numpy slot-value vectors. Returns decrypted
        [res][slots] array like runner.getOutput.

        jit: "auto" (whole-program jit only for small programs), True
        (force monolithic jit), or False (per-op cached dispatch — each op
        signature compiles once into a fused XLA unit and is reused, so big
        programs never pay a monolithic compile).
        """
        arg_cts = []
        for i, v in enumerate(arg_values):
            nl = (self.prog.arg_level[i] + 1) * self.rr
            scale = float(2.0 ** self.prog.arg_scale[i])
            ct = self.s.encrypt(v, scale=scale, nl=nl)
            arg_cts.append((ct.data, nl, scale))
        self.run_encrypted(arg_cts, jit=jit)
        return self.decrypt_outputs()

    def run_encrypted(self, arg_cts, jit="auto"):
        """Server-mode entry: arg_cts are pre-encrypted (data, nl, scale)
        triples (the client encrypted them; this VM may hold no secret key).
        Leaves output CIPHERTEXTS in self._last_outputs; the caller ships
        them back via getCtxt (reference SEAL_HEVM.cpp:463-473).

        jit: "auto"/"segment" (per-segment jit: every bootstrap-free window
        is one XLA program — the default), True (force ONE monolithic jit:
        only for small bootstrap-free non-streaming programs), or False
        (per-op cached dispatch)."""
        if jit is True:
            ok = not self._streaming and not self.debug
            if ok and any(op.opcode == OP_BOOTSTRAP for op in self.prog.ops):
                from ..crypto.bootstrap import EmulatedBootstrapper, Bootstrapper
                # emulated bootstrap needs a host round-trip -> not traceable
                ok = not isinstance(Bootstrapper(self.s), EmulatedBootstrapper)
            if not ok:
                jit = "segment"
        if self.debug:
            jit = False      # tracing prints per-op host metadata
        if jit is True:
            fn = self._get_compiled()
            outs = fn([c[0] for c in arg_cts], self.plains, self.ev.pack())
            _, out_meta = self._meta_only(arg_cts)
        elif jit in ("auto", "segment"):
            outs, out_meta = self._run_segmented(arg_cts)
        else:
            outs, out_meta = self._run_trace(arg_cts, self.plains)
        self._last_outputs = (outs, out_meta)
        return self._last_outputs

    def _meta_only(self, arg_cts):
        """Metadata is input-independent; recompute without touching arrays."""
        return self._trace_meta(arg_cts)

    def _trace_meta(self, arg_cts):
        # metadata-only interpretation (cheap, host; mirrors _exec_stream)
        meta = {}
        for i, (_, nl, scale) in enumerate(arg_cts):
            meta[i] = (nl, scale)
        for op in self.ops:
            self._meta_step(op, meta)
        return None, [meta[r] for r in self.res_dst]

    def _get_compiled(self):
        if self._compiled is None:
            arg_meta = [
                ((self.prog.arg_level[i] + 1) * self.rr,
                 float(2.0 ** self.prog.arg_scale[i]))
                for i in range(self.prog.arg_length)
            ]

            def f(arg_datas, plains, pk):
                arg_cts = [
                    (d, nl, sc) for d, (nl, sc) in zip(arg_datas, arg_meta)
                ]
                # pack rides in as a traced argument so the program embeds no
                # twiddle-table constants (see crypto/ops.py docstring)
                with self.ev.use_pack(pk):
                    outs, _ = self._run_trace(arg_cts, plains)
                return outs

            self._compiled = jax.jit(f)
        return self._compiled

    def decrypt_outputs(self):
        outs, out_meta = self._last_outputs
        from ..crypto.scheme import Ciphertext
        res = []
        for data, (nl, sc) in zip(outs, out_meta):
            res.append(self.s.decrypt(Ciphertext(data, sc)))
        return np.stack(res)
