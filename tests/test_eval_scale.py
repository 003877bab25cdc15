"""Protein-scale contact-map evaluation: 600-residue chain (VERDICT r2 #7).

The vectorized ``get_mapped_pdb_contacts`` must match a brute-force
per-pair reduction on a large chain, and cover all C(600,2) pairs.
"""

import time

import numpy as np
import pytest

from pydca_tpu.eval.visualizer import DCAVisualizer

N_RES = 600
ATOMS = ["N", "CA", "C", "O", "CB"]
# cycle of residue types whose one-letter codes are unambiguously protein
RES_CYCLE = [("ALA", "A"), ("LEU", "L"), ("LYS", "K"), ("GLU", "E")]


def _atom_line(serial, name, resname, resseq, x, y, z):
    elem = name[0]
    return (
        f"ATOM  {serial:5d} {name:<4s} {resname:>3s} A{resseq:4d}    "
        f"{x:8.3f}{y:8.3f}{z:8.3f}{1.0:6.2f}{0.0:6.2f}          {elem:>2s}\n"
    )


@pytest.fixture(scope="module")
def big_chain(tmp_path_factory):
    d = tmp_path_factory.mktemp("bigchain")
    rng = np.random.default_rng(42)
    # random walk backbone so some non-adjacent residues come close
    centers = np.cumsum(rng.normal(0, 2.0, size=(N_RES, 3)), axis=0)
    coords = []
    lines = []
    serial = 1
    seq = []
    for r in range(N_RES):
        resname, letter = RES_CYCLE[r % len(RES_CYCLE)]
        seq.append(letter)
        res_atoms = centers[r] + rng.normal(0, 0.8, size=(len(ATOMS), 3))
        res_atoms = np.round(res_atoms, 3)  # PDB text carries 3 decimals
        coords.append(res_atoms)
        for a, name in enumerate(ATOMS):
            x, y, z = res_atoms[a]
            lines.append(_atom_line(serial, name, resname, r + 1, x, y, z))
            serial += 1
    pdb = d / "big.pdb"
    pdb.write_text("".join(lines) + "END\n")
    ref = d / "ref.fa"
    ref.write_text(">ref\n" + "".join(seq) + "\n")
    dca = d / "dca.txt"
    rngp = np.random.default_rng(1)
    with open(dca, "w") as fh:
        for _ in range(50):
            i, j = sorted(rngp.choice(N_RES, 2, replace=False) + 1)
            fh.write(f"{i} {j} {rngp.random():.6f}\n")
    viz = DCAVisualizer(
        "protein",
        "A",
        str(pdb),
        refseq_file=str(ref),
        dca_file=str(dca),
        num_dca_contacts=50,
    )
    return viz, np.stack(coords)


def test_full_pair_coverage_and_speed(big_chain):
    viz, _ = big_chain
    t0 = time.time()
    mapped, not_in_pdb = viz.get_mapped_pdb_contacts()
    dt = time.time() - t0
    assert len(mapped) == N_RES * (N_RES - 1) // 2
    assert not_in_pdb == []
    # the quadratic-Python version took minutes at this size; the
    # vectorized reduction should finish in seconds even on CPU CI
    assert dt < 60


def test_matches_bruteforce_on_sampled_pairs(big_chain):
    viz, coords = big_chain
    mapped, _ = viz.get_mapped_pdb_contacts()
    rng = np.random.default_rng(7)
    for _ in range(300):
        i, j = sorted(rng.choice(N_RES, size=2, replace=False))
        d = np.linalg.norm(
            coords[i][:, None, :] - coords[j][None, :, :], axis=2
        )
        k = int(np.argmin(d))
        ai, aj = divmod(k, len(ATOMS))
        atom_pair, rid_i, rid_j, dist = mapped[(int(i), int(j))]
        assert rid_i == i + 1 and rid_j == j + 1
        # the vectorized path reduces in float32
        assert dist == pytest.approx(float(d[ai, aj]), rel=1e-5)
        assert atom_pair == ATOMS[ai] + "-" + ATOMS[aj]
