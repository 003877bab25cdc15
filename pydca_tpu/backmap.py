"""Reference-sequence backmapping: MSA column index -> refseq position.

Re-implements the reference's backmapper semantics
(``pydca/sequence_backmapper/sequence_backmapper.py``) on top of our own
aligner (:mod:`pydca_tpu.align`) instead of Biopython pairwise2:

1. find the MSA sequence that best matches the reference by local alignment
   score over *every* (gap-stripped) MSA sequence — here one batched JAX
   score kernel instead of N Python DPs (``sequence_backmapper.py:231-286``),
2. locally align ref vs. that template (gaps removed),
3. re-insert the template's MSA gaps into the aligned reference portion
   (``align_subsequences``, ``sequence_backmapper.py:288-336``),
4. walk the result to produce {MSA column -> refseq position}
   (``map_to_reference_sequence``, ``sequence_backmapper.py:339-466``).
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional

import numpy as np

from . import align as align_mod
from . import matrices
from .alphabets import get_alphabet
from .io.fasta import read_msa, read_sequences

logger = logging.getLogger(__name__)

__all__ = ["SequenceBackmapper"]

_GAP = "-"


class SequenceBackmapper:
    """Maps MSA columns onto positions of an ungapped reference sequence."""

    def __init__(
        self,
        msa_file: Optional[str] = None,
        alignment_data=None,
        ref_seq: Optional[str] = None,
        refseq_file: Optional[str] = None,
        biomolecule: Optional[str] = None,
    ):
        if biomolecule is None:
            raise ValueError("biomolecule must be given ('protein' or 'rna')")
        self.alphabet = get_alphabet(biomolecule)
        if msa_file:
            msa = read_msa(msa_file, biomolecule)
            self.__alignment = msa.char_form()
        elif alignment_data is not None:
            # list of int-form sequences (1-based reference convention not
            # assumed; accepts our 0-based encoded rows or char strings)
            seqs: List[str] = []
            for seq in alignment_data:
                if isinstance(seq, str):
                    seqs.append(seq.upper())
                else:
                    seqs.append(self.alphabet.decode(np.asarray(seq)))
            # order-preserving dedup (sequence_backmapper.py:54-56)
            unique, seen = [], set()
            for s in seqs:
                if s not in seen:
                    seen.add(s)
                    unique.append(s)
            self.__alignment = unique
        else:
            raise ValueError("provide msa_file or alignment_data")

        if refseq_file:
            ids, seqs = read_sequences(refseq_file)
            if len(seqs) > 1:
                logger.warning(
                    "found %d reference sequences in %s; taking the first",
                    len(seqs),
                    refseq_file,
                )
            self.__ref_sequence = seqs[0].strip().upper()
        elif ref_seq:
            self.__ref_sequence = ref_seq.strip().upper()
        else:
            raise ValueError("provide ref_seq or refseq_file")
        self._validate_refseq()

        self.__submat = matrices.submatrix_for(biomolecule, self.alphabet.letters)
        self.__gap_open, self.__gap_extend = matrices.gap_penalties_for(biomolecule)

    # ---------------------------------------------------------------- helpers
    @property
    def alignment(self) -> List[str]:
        return self.__alignment

    @property
    def ref_sequence(self) -> str:
        return self.__ref_sequence

    def _validate_refseq(self):
        """Reference sequences must be ungapped standard residues
        (``sequence_backmapper.py:127-149``)."""
        for res in self.__ref_sequence:
            if not self.alphabet.is_standard(res):
                raise ValueError(
                    "reference sequence should only contain standard residues; "
                    f"found {res!r}"
                )

    def _encode_std(self, seq: str) -> np.ndarray:
        """Encode a gap-free standard-residue string to state indices."""
        return self.alphabet.encode_str(seq).astype(np.int32)

    def align_pairs_local(self, ref_seq: str, other_seq: str, score_only=False):
        """Local alignment (score or full) with the reference's matrices."""
        a = self._encode_std(ref_seq)
        b = self._encode_std(other_seq)
        score, a_start, b_start, path = align_mod.local_align(
            a, b, self.__submat, self.__gap_open, self.__gap_extend
        )
        if score_only:
            return score
        return score, a_start, b_start, path

    # -------------------------------------------------------- template search
    def find_matching_seqs_from_alignment(self) -> List[str]:
        """Best-matching MSA sequences to the reference (first one is used).

        Shortcut when the first MSA sequence (gaps stripped) equals the
        reference (``sequence_backmapper.py:252-260``); otherwise one batched
        score kernel over all sequences.
        """
        first = self.__alignment[0].replace(_GAP, "")
        if first == self.__ref_sequence:
            logger.info("first sequence in alignment matches reference exactly")
            return [self.__alignment[0]]

        stripped = [s.replace(_GAP, "") for s in self.__alignment]
        wmax = max(len(s) for s in stripped)
        pad = -1
        temps = np.full((len(stripped), wmax), pad, dtype=np.int32)
        for k, s in enumerate(stripped):
            if s:
                temps[k, : len(s)] = self._encode_std(s)
        scores = align_mod.batch_local_align_scores(
            self._encode_std(self.__ref_sequence),
            temps,
            self.__submat,
            self.__gap_open,
            self.__gap_extend,
            pad,
        )
        max_score = scores.max()
        matching = [
            self.__alignment[k] for k in np.nonzero(scores == max_score)[0]
        ]
        if len(matching) > 1:
            logger.warning(
                "found %d sequences in MSA matching the reference; taking the first",
                len(matching),
            )
        return matching

    # ---------------------------------------------------------------- mapping
    @staticmethod
    def align_subsequences(
        ref_middle_subseq: str,
        template_subseq_in_msa: str,
        num_res_middle_template: int,
    ) -> str:
        """Re-insert the template's MSA gaps into the aligned ref portion.

        Behavioural port of ``sequence_backmapper.py:288-336`` including the
        early-exit boundary check.
        """
        mapped = []
        res_count = 0
        pos = 0
        for site in template_subseq_in_msa:
            if res_count == num_res_middle_template:
                break
            if site != _GAP:
                mapped.append(ref_middle_subseq[pos])
                pos += 1
                res_count += 1
                if pos == len(ref_middle_subseq):
                    break
            else:
                if ref_middle_subseq[pos] != _GAP:
                    mapped.append(_GAP)
                else:
                    mapped.append(ref_middle_subseq[pos])
                    pos += 1
        mapped.extend(list(ref_middle_subseq[pos:]))
        return "".join(mapped)

    def map_to_reference_sequence(self) -> Dict[int, int]:
        """{MSA column -> refseq position} (``sequence_backmapper.py:339-466``)."""
        template_seq_in_msa = self.find_matching_seqs_from_alignment()[0]
        template_stripped = template_seq_in_msa.replace(_GAP, "")

        score, ref_start, temp_start, path = self.align_pairs_local(
            self.__ref_sequence, template_stripped
        )
        ref_mid, temp_mid = align_mod.aligned_strings(
            self.__ref_sequence, template_stripped, ref_start, temp_start, path
        )
        num_leading_res_ref = ref_start
        num_leading_res_template = temp_start
        num_res_middle_template = sum(1 for c in temp_mid if c != _GAP)

        # start of matching region within the gapped MSA template
        res_count = 0
        start_indx_in_msa = len(template_seq_in_msa)
        for k, site in enumerate(template_seq_in_msa):
            if res_count == num_leading_res_template:
                start_indx_in_msa = k
                break
            if site != _GAP:
                res_count += 1

        template_subseq_in_msa = template_seq_in_msa[start_indx_in_msa:]
        backmapped = self.align_subsequences(
            ref_mid, template_subseq_in_msa, num_res_middle_template
        )

        mapped_sites: Dict[int, int] = {}
        mapped_res_count = 0
        limit = len(template_seq_in_msa) - start_indx_in_msa
        for k, site in enumerate(backmapped):
            if k == limit:
                break
            if site != _GAP:
                mapped_sites[mapped_res_count + num_leading_res_ref] = (
                    start_indx_in_msa + k
                )
                mapped_res_count += 1
        logger.info(
            "mapped %d of %d reference residues",
            len(mapped_sites),
            len(self.__ref_sequence),
        )
        # invert: keys = MSA columns, values = refseq positions
        return {v: k for k, v in mapped_sites.items()}
