"""Evaluator characterization on a full-featured PDB fixture.

Round-1 VERDICT #6 asks for a real-structure characterization of the
evaluator's tricky paths (reference ``contact_visualizer.py:1172-1436``).
This host has no network egress and no PDB file on disk, so the fixture is
a *generated* structure that exercises every real-file hazard with known
geometric ground truth:

- two models (``MODEL 2`` places every atom at the origin — parsing past
  ``ENDMDL`` would turn everything into a contact);
- altloc conformers A/B where B sits 500 Angstrom away and the contact is
  decidable only through conformer A;
- an insertion-code residue (12A) that must count as its own residue;
- HETATM ions/waters adjacent to the chain (must be excluded);
- a modified nucleotide (1MA) in the middle of the chain (non-standard,
  must drop out of the chain sequence);
- hydrogens planted 1 Angstrom from a distant residue (must be excluded
  from min-distance atoms);
- a second, protein, chain for chain-classification;
- a reference sequence extending the PDB chain on both ends (alignment
  offset + refseq positions missing from the PDB).

Contacts are planted at chosen pairs; every category assertion below is
derived from the constructed coordinates, not from the code under test.
"""

import os
from collections import OrderedDict

import pytest

from pydca_tpu.eval.pdb import PDBContent
from pydca_tpu.eval.visualizer import DCAVisualizer, RNASecStructContent

RNA_SEQ = "GGCUAGCUAGGCAUCCGAUAGCCG"  # 24 nt, pdb chain X
REF_SEQ = "AU" + RNA_SEQ + "GC"  # 28 nt: pdb index k -> refseq k + 2
PROT_SEQ = "MKVLAGSTYWED"
PROT_THREE = [
    "MET", "LYS", "VAL", "LEU", "ALA", "GLY",
    "SER", "THR", "TYR", "TRP", "GLU", "ASP",
]


def _atom(serial, name, resname, chain, resseq, x, y, z, icode=" ", altloc=" ",
          het=False, occ=1.0):
    rec = "HETATM" if het else "ATOM  "
    elem = name[0]
    return (
        f"{rec}{serial:5d} {name:<4s}{altloc}{resname:>3s} {chain}"
        f"{resseq:4d}{icode}   {x:8.3f}{y:8.3f}{z:8.3f}{occ:6.2f}{0.0:6.2f}"
        f"          {elem:>2s}\n"
    )


def _write_structure(path):
    lines = ["HEADER    SYNTHETIC RIBOSWITCH CHARACTERIZATION\n", "MODEL     1\n"]
    serial = 1

    def emit(*args, **kw):
        nonlocal serial
        lines.append(_atom(serial, *args, **kw))
        serial += 1

    # chain X: 24 standard RNA residues on a 10-Angstrom lattice.
    # resseq: 1..12, then 12 with icode 'A', then 13..23.
    for k, letter in enumerate(RNA_SEQ):
        if k < 12:
            resseq, icode = k + 1, " "
        elif k == 12:
            resseq, icode = 12, "A"
        else:
            resseq, icode = k, " "
        bx = 10.0 * k
        if k == 3:
            # altloc-decisive residue: ONLY a phosphate, conformer A at the
            # lattice point, conformer B 500 Angstrom away
            emit("P", letter, "X", resseq, bx, 0.0, 0.0, icode=icode, altloc="A",
                 occ=0.6)
            emit("P", letter, "X", resseq, 500.0, 500.0, 500.0, icode=icode,
                 altloc="B", occ=0.4)
            emit("H5'", letter, "X", resseq, bx, 0.5, 0.5, icode=icode)
            continue
        emit("P", letter, "X", resseq, bx, 0.0, 0.0, icode=icode)
        emit("C4'", letter, "X", resseq, bx, 1.5, 0.0, icode=icode)
        emit("N1", letter, "X", resseq, bx, 0.0, 1.5, icode=icode)
        emit("H5'", letter, "X", resseq, bx, 0.5, 0.5, icode=icode)
        if k == 16:
            # planted contact: O2' of residue 16 sits 2.2 A from residue 3's
            # conformer-A phosphate (and > 10 A from residues 2 and 4)
            emit("O2'", letter, "X", resseq, 30.0, 0.0, 2.2, icode=icode)
        if k == 20:
            # planted contact with residue 6
            emit("O2'", letter, "X", resseq, 60.0, 1.0, 1.0, icode=icode)
        if k == 9:
            # hydrogen 1 A from residue 22's phosphate: must NOT create a
            # contact (H atoms are excluded from min-distance computation)
            emit("H2''", letter, "X", resseq, 220.0, 0.0, 1.0, icode=icode)
        if k == 18:
            # modified nucleotide in the middle of the chain: non-standard
            # residue name, must not appear in the chain sequence
            emit("C1'", "1MA", "X", 60, 0.0, -50.0, 0.0)
    # hetero ions/waters right next to residue 5 (must be excluded)
    emit("MG", "MG", "X", 101, 50.0, 2.0, 0.0, het=True)
    emit("O", "HOH", "X", 102, 50.0, 0.0, 2.0, het=True)

    # chain P: CA-only protein, far away
    for k, res3 in enumerate(PROT_THREE):
        emit("CA", res3, "P", k + 1, 0.0, 300.0 + 10.0 * k, 0.0)

    lines.append("ENDMDL\n")
    # second model: everything at the origin — must be ignored
    lines.append("MODEL     2\n")
    for k, letter in enumerate(RNA_SEQ):
        lines.append(_atom(9000 + k, "P", letter, "X", k + 1, 0.0, 0.0, 0.0))
    lines.append("ENDMDL\nEND\n")
    with open(path, "w") as fh:
        fh.writelines(lines)
    return path


# DCA ranking in 1-based refseq coordinates (pdb k maps to refseq k+2):
# two planted contacts, two far pairs, two pairs touching refseq positions
# absent from the PDB, and one linear pair that the |i-j|>4 filter drops.
DCA_ROWS = [
    (6, 19, 3.0),   # refseq0 (5, 18)  = pdb (3, 16)   -> tp
    (9, 23, 2.5),   # refseq0 (8, 22)  = pdb (6, 20)   -> tp
    (6, 24, 2.0),   # refseq0 (5, 23)  = pdb (3, 21)   -> fp (180 A)
    (1, 21, 1.5),   # refseq0 (0, 20): position 0 not in PDB -> missing
    (3, 8, 1.0),    # refseq0 (2, 7)   = pdb (0, 5)    -> fp (50 A)
    (8, 28, 0.5),   # refseq0 (7, 27): position 27 not in PDB -> missing
    (12, 14, 0.4),  # |i-j| = 2 <= linear_dist: filtered out of the top-N
]


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("realistic_pdb")
    _write_structure(str(d / "struct.pdb"))
    with open(d / "ref.fa", "w") as fh:
        fh.write(">synthetic riboswitch refseq\n" + REF_SEQ + "\n")
    with open(d / "dca.txt", "w") as fh:
        fh.write("# i j score\n")
        for i, j, s in DCA_ROWS:
            fh.write(f"{i} {j} {s}\n")
    with open(d / "ss.txt", "w") as fh:
        # one WC pair at refseq positions (5, 18) — a planted tp pair
        ss = ["."] * len(REF_SEQ)
        ss[5], ss[18] = "(", ")"
        fh.write("# synthetic secondary structure\n" + "".join(ss) + "\n")
    return d


@pytest.fixture(scope="module")
def viz(fixture_dir):
    return DCAVisualizer(
        "rna",
        "X",
        str(fixture_dir / "struct.pdb"),
        refseq_file=str(fixture_dir / "ref.fa"),
        dca_file=str(fixture_dir / "dca.txt"),
        num_dca_contacts=6,
    )


class TestPDBParsing:
    def test_chain_classification_and_sequences(self, fixture_dir):
        content = PDBContent(str(fixture_dir / "struct.pdb"))
        seqs = content.pdb_chain_sequences
        assert seqs["X"] == ("RNA", RNA_SEQ)  # 1MA dropped, 12A kept
        assert seqs["P"] == ("PROTEIN", PROT_SEQ)

    def test_insertion_code_residue_is_distinct(self, fixture_dir):
        content = PDBContent(str(fixture_dir / "struct.pdb"))
        rna = content.standard_residues("X", "rna")
        assert len(rna) == 24
        with_icode = [r for r in rna if r.icode == "A"]
        assert len(with_icode) == 1
        assert with_icode[0].resseq == 12
        # both resseq-12 residues present
        assert sum(1 for r in rna if r.resseq == 12) == 2

    def test_altloc_first_conformer_wins(self, fixture_dir):
        content = PDBContent(str(fixture_dir / "struct.pdb"))
        res3 = content.standard_residues("X", "rna")[3]
        names, xyz = res3.heavy_atoms()
        assert names == ["P"]
        assert tuple(xyz[0]) == (30.0, 0.0, 0.0)  # conformer A, not B

    def test_second_model_ignored(self, fixture_dir):
        content = PDBContent(str(fixture_dir / "struct.pdb"))
        rna = content.standard_residues("X", "rna")
        # model 2 put residue 0's P at the origin a second time; residue 0
        # must still have exactly one P (from model 1)
        assert rna[0].atom_names.count("P") == 1

    def test_hetero_excluded(self, fixture_dir):
        content = PDBContent(str(fixture_dir / "struct.pdb"))
        rna = content.standard_residues("X", "rna")
        assert all(not r.hetero for r in rna)
        assert all(r.name not in ("MG", "HOH") for r in rna)


class TestMapping:
    def test_refseq_mapping_offset_and_missing(self, viz):
        mapping, not_in_pdb = viz.map_pdbseq_to_refseq()
        assert mapping == OrderedDict((k, k + 2) for k in range(24))
        assert sorted(not_in_pdb) == [0, 1, 26, 27]


class TestContacts:
    def test_pdb_contacts_exactly_the_planted_pairs(self, viz):
        mapped, _ = viz.get_mapped_pdb_contacts()
        contacts = {p for p, m in mapped.items() if m[3] < 8.0}
        assert contacts == {(5, 18), (8, 22)}

    def test_planted_distances(self, viz):
        mapped, _ = viz.get_mapped_pdb_contacts()
        assert mapped[(5, 18)][3] == pytest.approx(2.2, abs=1e-6)
        assert mapped[(5, 18)][0] == "P-O2'"
        # nearest heavy pair: residue 6 C4' (60, 1.5, 0) vs planted O2'
        # (60, 1, 1) -> sqrt(0.25 + 1)
        assert mapped[(8, 22)][3] == pytest.approx(1.25**0.5, abs=1e-6)

    def test_hydrogen_never_a_contact_atom(self, viz):
        mapped, _ = viz.get_mapped_pdb_contacts()
        # the planted H2'' of residue 9 sits 1 A from residue 22's P
        assert mapped[(11, 24)][3] > 8.0
        for _, meta in mapped.items():
            a1, a2 = meta[0].split("-")
            assert not a1.startswith("H") and not a2.startswith("H")

    def test_contact_categories(self, viz):
        cats = viz.contact_categories()
        assert set(cats["tp"]) == {(5, 18), (8, 22)}
        assert set(cats["fp"]) == {(5, 23), (2, 7)}
        assert set(cats["missing"]) == {(0, 20), (7, 27)}
        assert set(cats["pdb"]) == {(5, 18), (8, 22)}

    def test_true_positive_rates(self, viz):
        rates = viz.compute_true_positive_rates()
        assert rates["dca"] == pytest.approx(
            [1.0, 1.0, 2 / 3, 2 / 4, 2 / 5, 2 / 6]
        )
        assert rates["pdb"] == pytest.approx(
            [1.0, 1.0, 2 / 3, 2 / 4, 2 / 5, 2 / 6]
        )


class TestSecStructAndPlots:
    def test_wc_pairs_and_neighbors(self, fixture_dir):
        ss = RNASecStructContent(str(fixture_dir / "ss.txt"))
        assert ss.wcpairs == ((5, 18),)
        viz = DCAVisualizer(
            "rna",
            "X",
            str(fixture_dir / "struct.pdb"),
            refseq_file=str(fixture_dir / "ref.fa"),
            dca_file=str(fixture_dir / "dca.txt"),
            rna_secstruct_file=str(fixture_dir / "ss.txt"),
            wc_neighbor_dist=1,
            num_dca_contacts=2,
        )
        got = set(viz.get_wc_pairs_and_neighbors())
        assert got == {(a, b) for a in (4, 5, 6) for b in (17, 18, 19)}

    def test_plot_contact_map_writes_file_and_splits_wc(self, fixture_dir, tmp_path):
        viz = DCAVisualizer(
            "rna",
            "X",
            str(fixture_dir / "struct.pdb"),
            refseq_file=str(fixture_dir / "ref.fa"),
            dca_file=str(fixture_dir / "dca.txt"),
            rna_secstruct_file=str(fixture_dir / "ss.txt"),
            wc_neighbor_dist=0,
            num_dca_contacts=2,
        )
        out = str(tmp_path / "cm.png")
        cats = viz.plot_contact_map(show=False, save_path=out)
        assert os.path.getsize(out) > 0
        assert set(cats["tp-wc"]) == {(5, 18)}
        assert set(cats["tp-nwc"]) == {(8, 22)}

    def test_plot_tp_rate_writes_file(self, viz, tmp_path):
        out = str(tmp_path / "tp.png")
        rates = viz.plot_true_positive_rates(show=False, save_path=out)
        assert os.path.getsize(out) > 0
        assert rates["dca"][0] == 1.0
