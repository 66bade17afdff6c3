from .pack import (
    encode_bases,
    decode_kmers,
    encode_kmer_string,
    revcomp_kmers,
    canonical_kmers,
    sequence_kmers,
    batch_kmers,
)
from .count import KmerCounter
from .cutoffs import cutoff_lower, cutoff_upper
