"""Multi-host data loading: host-local FASTA shards -> one global device array.

The reference loads the whole MSA in-process (it has no distributed mode);
``pydca_tpu.io.fasta.read_msa`` likewise reads the full file on every host.
At 100k+-sequence scale on a multi-host slice that wastes host RAM and
ingest time H-fold.  This module gives each process its own slice of the
data (SURVEY.md section 5, "host-local data loading of FASTA shards"):

1. **Shard loading** — either a list of FASTA shard files (process ``p`` of
   ``P`` opens only ``files[p::P]``; true host-local IO) or a single file
   (every host parses the text — IO is cheap — but *encodes and retains*
   only its round-robin stripe, bounding host memory at N/P rows).
2. **Global dedup** — the reference drops duplicate sequences after
   encoding, keeping the first occurrence in file order
   (``fasta_reader.py:153``).  Done here without gathering sequence data:
   each row is hashed (blake2b, 128 bits — collision probability ~1e-21 at
   N=1e9, documented trade-off), hashes + global file-order indices are
   all-gathered (16 bytes/row, not L bytes), and every process keeps its
   rows whose index is the global minimum for that hash.
3. **Global array** — local rows pad to a common per-process count and
   assemble into one global ``(P * n_pad, L)`` array sharded over the
   mesh's ``data`` axis via ``jax.make_array_from_process_local_data``;
   a ``valid`` mask marks the pad rows.  Every downstream statistic is a
   weighted sum over sequences, so pad rows are inert once their weight is
   zero — :func:`pydca_tpu.stats.sequence_weights` takes ``valid`` so pads
   never count as neighbors either.

Single-host fallback: with one process this degrades to an ordinary read
(stripe = everything), so the same entry point serves both cases.
"""

from __future__ import annotations

import hashlib
import logging
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

from ..alphabets import get_alphabet
from ..io.fasta import parse_fasta
from .mesh import Mesh, data_sharding, make_mesh

logger = logging.getLogger(__name__)

__all__ = [
    "LocalShard",
    "ShardedMSA",
    "load_local_shard",
    "global_dedup_keep",
    "read_msa_distributed",
]


@dataclass
class LocalShard:
    """This process's rows: encoded data + global file-order index per row."""

    data: np.ndarray  # (n_local, L) int8
    ids: List[str]
    global_index: np.ndarray  # (n_local,) int64, position in global file order


@dataclass
class ShardedMSA:
    """Deduplicated, process-local view of a distributed MSA."""

    local_data: np.ndarray  # (n_pad, L) int8, pad rows = gap state
    local_valid: np.ndarray  # (n_pad,) bool
    ids: List[str]
    q: int
    global_num_seqs: int  # total rows after dedup, across all processes
    seqs_len: int
    num_processes: int

    def global_array(self, mesh: Optional[Mesh] = None) -> Tuple[jax.Array, jax.Array]:
        """Assemble the global (P * n_pad, L) array + validity mask, sharded
        over the mesh's 'data' axis.  Call from every process."""
        if mesh is None:
            mesh = make_mesh()
        # pad the local rows to a multiple of this process's device count
        # along 'data' so the global shape divides evenly across shards
        local_dev = max(1, mesh.shape["data"] // self.num_processes)
        n = self.local_data.shape[0]
        extra = (-n) % local_dev
        pad = np.full((extra, self.seqs_len), self.q - 1, np.int8)
        data_np = np.concatenate([self.local_data, pad], axis=0)
        valid_np = np.concatenate([self.local_valid, np.zeros(extra, bool)])
        sharding = data_sharding(mesh, 2)
        sharding1 = data_sharding(mesh, 1)
        data = jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(data_np.astype(np.int32))
        )
        valid = jax.make_array_from_process_local_data(
            sharding1, np.ascontiguousarray(valid_np)
        )
        return data, valid


def _row_hashes(data: np.ndarray) -> np.ndarray:
    """(n, 2) uint64 blake2b-128 hash per row."""
    out = np.empty((data.shape[0], 2), dtype=np.uint64)
    row_bytes = np.ascontiguousarray(data, dtype=np.int8)
    for k in range(data.shape[0]):
        d = hashlib.blake2b(row_bytes[k].tobytes(), digest_size=16).digest()
        out[k] = np.frombuffer(d, dtype=np.uint64)
    return out


def load_local_shard(
    files: Union[str, Sequence[str]],
    biomolecule: str,
    process_id: int,
    num_processes: int,
) -> LocalShard:
    """Parse and encode only this process's slice of the input.

    ``files`` as a list: shard files are assigned round-robin
    (``files[process_id::num_processes]``) and each process opens only its
    own — the global order is (file index, record index).  ``files`` as a
    single path: every process parses the text but encodes/retains only
    records ``r`` with ``r % num_processes == process_id``.
    """
    alphabet = get_alphabet(biomolecule)
    ids: List[str] = []
    seqs: List[str] = []
    gidx: List[int] = []

    if isinstance(files, str):
        with open(files) as fh:
            all_ids, all_seqs = parse_fasta(fh.read())
        for r in range(process_id, len(all_seqs), num_processes):
            ids.append(all_ids[r])
            seqs.append(all_seqs[r])
            gidx.append(r)
    else:
        files = list(files)
        # global record order: file-major — count records per file first so
        # indices are consistent across processes without communication
        counts = []
        for f in files:
            with open(f) as fh:
                counts.append(sum(1 for line in fh if line.startswith(">")))
        offsets = np.concatenate([[0], np.cumsum(counts)])
        for fi in range(process_id, len(files), num_processes):
            with open(files[fi]) as fh:
                f_ids, f_seqs = parse_fasta(fh.read())
            if len(f_seqs) != counts[fi]:
                raise ValueError(
                    f"{files[fi]}: {len(f_seqs)} records parsed but "
                    f"{counts[fi]} headers counted"
                )
            ids.extend(f_ids)
            seqs.extend(f_seqs)
            gidx.extend(range(offsets[fi], offsets[fi] + counts[fi]))

    if seqs:
        lengths = {len(s) for s in seqs}
        if len(lengths) != 1:
            raise ValueError(f"inconsistent sequence lengths {sorted(lengths)}")
        data = alphabet.encode_many(seqs)
    else:  # a process may own zero shards
        data = np.zeros((0, 0), dtype=np.int8)
    return LocalShard(
        data=data, ids=ids, global_index=np.asarray(gidx, dtype=np.int64)
    )


def global_dedup_keep(
    local_hashes: np.ndarray,
    local_index: np.ndarray,
    all_hashes: np.ndarray,
    all_index: np.ndarray,
) -> np.ndarray:
    """Keep mask for this process's rows under global first-occurrence dedup.

    A row survives iff its global file-order index is the minimum among all
    rows (on any process) with the same 128-bit hash — exactly the
    reference's keep-first-in-file-order semantics (``fasta_reader.py:153``)
    evaluated distributively.
    """
    first: dict = {}
    for h, idx in zip(map(tuple, all_hashes.tolist()), all_index.tolist()):
        prev = first.get(h)
        if prev is None or idx < prev:
            first[h] = idx
    return np.array(
        [
            first[tuple(h)] == idx
            for h, idx in zip(local_hashes.tolist(), local_index.tolist())
        ],
        dtype=bool,
    )


def _allgather_varlen(local: np.ndarray, num_processes: int):
    """All-gather variable-length per-process arrays (pad to max count).

    Uses ``jax.experimental.multihost_utils.process_allgather``; with one
    process this is the identity.
    """
    if num_processes == 1:
        return [local]
    from jax.experimental import multihost_utils

    n_local = np.asarray([local.shape[0]], dtype=np.int64)
    counts = multihost_utils.process_allgather(n_local).reshape(-1)
    n_max = int(counts.max())
    pad = np.zeros((n_max - local.shape[0],) + local.shape[1:], local.dtype)
    padded = np.concatenate([local, pad], axis=0)
    gathered = multihost_utils.process_allgather(padded)
    return [gathered[p, : int(counts[p])] for p in range(num_processes)]


def read_msa_distributed(
    files: Union[str, Sequence[str]],
    biomolecule: str,
    *,
    dedup: bool = True,
    process_id: Optional[int] = None,
    num_processes: Optional[int] = None,
) -> ShardedMSA:
    """Host-local distributed MSA ingestion (see module docstring).

    ``process_id``/``num_processes`` default to the jax runtime's values;
    pass them explicitly to simulate a multi-process layout in tests.
    """
    pid = jax.process_index() if process_id is None else int(process_id)
    nproc = jax.process_count() if num_processes is None else int(num_processes)
    alphabet = get_alphabet(biomolecule)

    shard = load_local_shard(files, biomolecule, pid, nproc)
    keep = np.ones(shard.data.shape[0], dtype=bool)
    if dedup and shard.data.size:
        hashes = _row_hashes(shard.data)
        if nproc == 1:
            keep = global_dedup_keep(
                hashes, shard.global_index, hashes, shard.global_index
            )
        else:
            h_parts = _allgather_varlen(hashes, nproc)
            i_parts = _allgather_varlen(
                shard.global_index.reshape(-1, 1), nproc
            )
            all_h = np.concatenate(h_parts, axis=0)
            all_i = np.concatenate([p.reshape(-1) for p in i_parts], axis=0)
            keep = global_dedup_keep(hashes, shard.global_index, all_h, all_i)

    data = shard.data[keep]
    ids = [shard.ids[k] for k in np.nonzero(keep)[0]]
    n_local = data.shape[0]

    # common padded per-process count (max across processes)
    if nproc == 1:
        n_pad, n_global = n_local, n_local
    else:
        from jax.experimental import multihost_utils

        counts = multihost_utils.process_allgather(
            np.asarray([n_local], dtype=np.int64)
        ).reshape(-1)
        n_pad, n_global = int(counts.max()), int(counts.sum())
    seqs_len = data.shape[1] if data.size else 0
    pad_rows = np.full((n_pad - n_local, seqs_len), alphabet.gap_state, np.int8)
    local_data = np.concatenate([data, pad_rows], axis=0)
    local_valid = np.zeros(n_pad, dtype=bool)
    local_valid[:n_local] = True
    logger.info(
        "process %d/%d: %d local rows (%d after dedup, %d pad)",
        pid, nproc, shard.data.shape[0], n_local, n_pad - n_local,
    )
    return ShardedMSA(
        local_data=local_data,
        local_valid=local_valid,
        ids=ids,
        q=alphabet.q,
        global_num_seqs=n_global,
        seqs_len=seqs_len,
        num_processes=nproc,
    )


def weights_distributed(
    sharded: ShardedMSA,
    seqid: float,
    mesh: Optional[Mesh] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sequence weights over the globally assembled, data-sharded MSA.

    Returns ``(msa_global, weights, valid)``; pad rows get weight 0, so all
    downstream weighted statistics and the plm loss ignore them.
    """
    from .. import stats

    if mesh is None:
        mesh = make_mesh()
    with jax.set_mesh(mesh):
        msa_g, valid_g = sharded.global_array(mesh)
        w = stats.sequence_weights(msa_g, seqid, sharded.q, valid=valid_g)
        w = jnp.where(valid_g, w, 0.0)
    return msa_g, w, valid_g
