"""Evaluator tests on a synthetic PDB structure with known contacts."""

import os

import numpy as np
import pytest

from pydca_tpu.eval.pdb import PDBContent, parse_pdb_atoms
from pydca_tpu.eval.visualizer import (
    DCAContent,
    DCAVisualizer,
    RefSeqContent,
    RNASecStructContent,
)


def _pdb_atom_line(serial, name, resname, chain, resseq, x, y, z, element):
    return (
        f"ATOM  {serial:>5} {name:<4}{'':1}{resname:>3} {chain}{resseq:>4}"
        f"{'':4}{x:8.3f}{y:8.3f}{z:8.3f}{1.00:6.2f}{0.00:6.2f}"
        f"{'':10}{element:>2}\n"
    )


@pytest.fixture()
def synthetic_rna(tmp_path):
    """A 6-residue RNA chain laid out so residues (0,5), (1,4) are close
    (< 8 A) and others are far; residue 3 of the refseq is missing in PDB."""
    # refseq: A C G U A C  (6 nt). PDB chain misses refseq position 2 ('G').
    refseq = "ACGUAC"
    pdb_res = ["A", "C", "U", "A", "C"]  # refseq positions 0,1,3,4,5
    # coordinates: hairpin-like, ends close together
    positions = {
        0: (0.0, 0.0, 0.0),
        1: (10.0, 0.0, 0.0),
        2: (20.0, 0.0, 0.0),  # refseq pos 3 (U)
        3: (10.0, 3.0, 0.0),  # refseq pos 4 (A), close to residue 1
        4: (0.0, 3.0, 0.0),  # refseq pos 5 (C), close to residue 0
    }
    lines = []
    serial = 1
    for k, resname in enumerate(pdb_res):
        x, y, z = positions[k]
        lines.append(
            _pdb_atom_line(serial, "P", resname, "X", k + 1, x, y, z, "P")
        )
        serial += 1
        lines.append(
            _pdb_atom_line(serial, "C1'", resname, "X", k + 1, x + 1, y, z, "C")
        )
        serial += 1
        # hydrogen should be ignored in distance computation
        lines.append(
            _pdb_atom_line(serial, "H1", resname, "X", k + 1, x, y + 0.1, z, "H")
        )
        serial += 1
    lines.append("END\n")
    pdb_path = tmp_path / "toy.pdb"
    pdb_path.write_text("".join(lines))

    refseq_path = tmp_path / "ref.fa"
    refseq_path.write_text(f">ref\n{refseq}\n")

    # DCA file ranks (1,6) and (2,5) first (1-indexed), then some others
    dca_path = tmp_path / "dca.txt"
    dca_path.write_text(
        "# header\n"
        "1 6 3.5\n"
        "2 5 3.0\n"
        "1 4 2.0\n"
        "3 6 1.0\n"
    )
    return str(pdb_path), str(refseq_path), str(dca_path), refseq


def test_parse_pdb(synthetic_rna):
    pdb_path, *_ = synthetic_rna
    chains = parse_pdb_atoms(pdb_path)
    assert list(chains) == ["X"]
    assert len(chains["X"]) == 5
    content = PDBContent(pdb_path)
    biomol, seq = content.pdb_chain_sequences["X"]
    assert biomol == "RNA"
    assert seq == "ACUAC"


def test_map_pdbseq_to_refseq(synthetic_rna):
    pdb_path, refseq_path, dca_path, refseq = synthetic_rna
    viz = DCAVisualizer(
        "rna", "X", pdb_path, refseq_file=refseq_path, dca_file=dca_path,
        linear_dist=2, contact_dist=8.0,
    )
    mapping, missing = viz.map_pdbseq_to_refseq()
    # PDB residues 0..4 map to refseq positions 0,1,3,4,5; refseq pos 2 missing
    assert mapping == {0: 0, 1: 1, 2: 3, 3: 4, 4: 5}
    assert missing == [2]


def test_contact_categories_and_tp_rates(synthetic_rna):
    pdb_path, refseq_path, dca_path, refseq = synthetic_rna
    viz = DCAVisualizer(
        "rna", "X", pdb_path, refseq_file=refseq_path, dca_file=dca_path,
        linear_dist=2, contact_dist=8.0, num_dca_contacts=4,
    )
    cats = viz.contact_categories()
    # (0,5): residues 0 and 4 in PDB, distance ~3 -> true positive
    assert (0, 5) in cats["tp"]
    # (1,4): residues 1 and 3, distance ~3 -> also a contact; |1-4|=3 > 2 ok
    assert (1, 4) in cats["tp"]
    # (0,3): distance from (0,0) to (10,3) ~ 10 -> beyond 8 A: false positive
    assert (0, 3) in cats["fp"]
    # (2,5): refseq pos 2 missing in PDB
    assert (2, 5) in cats["missing"]
    # PDB contact list only holds pairs within cutoff
    for pair, meta in cats["pdb"].items():
        assert meta[3] < 8.0

    rates = viz.compute_true_positive_rates()
    assert rates["dca"][0] == 1.0  # top-ranked (0,5) is a true contact
    assert len(rates["dca"]) == len(rates["pdb"])
    assert rates["pdb"][0] == 1.0


def test_plot_contact_map_and_tp_rates(synthetic_rna, tmp_path):
    pdb_path, refseq_path, dca_path, _ = synthetic_rna
    viz = DCAVisualizer(
        "rna", "X", pdb_path, refseq_file=refseq_path, dca_file=dca_path,
        linear_dist=2, contact_dist=8.0, num_dca_contacts=2,
    )
    out_png = str(tmp_path / "cm.png")
    cats = viz.plot_contact_map(show=False, save_path=out_png)
    assert os.path.exists(out_png)
    assert "pdb" in cats
    out_png2 = str(tmp_path / "tpr.png")
    viz.plot_true_positive_rates(show=False, save_path=out_png2)
    assert os.path.exists(out_png2)


def test_secstruct_parsing(tmp_path):
    ss = tmp_path / "ss.txt"
    ss.write_text("# comment\n((..))\n")
    content = RNASecStructContent(str(ss))
    assert content.wcpairs == ((0, 5), (1, 4))
    bad = tmp_path / "bad.txt"
    bad.write_text("((..)\n")
    with pytest.raises(Exception):
        RNASecStructContent(str(bad))


def test_refseq_content_type_detection(tmp_path):
    f = tmp_path / "refs.fa"
    f.write_text(">rna\nACGU\n>prot\nMKVLAW\n")
    content = RefSeqContent(str(f))
    types = [v[0] for v in content.ref_sequences.values()]
    assert types == ["RNA", "PROTEIN"]


def test_dca_content_from_scores():
    content = DCAContent(sorted_dca_scores=[((0, 5), 3.5), ((1, 4), 3.0)])
    assert content.dca_ranked_pairs == ((0, 5), (1, 4))
