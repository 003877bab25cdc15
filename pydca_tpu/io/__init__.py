from .fasta import MSA, read_msa, write_fasta  # noqa: F401
