from .nw import AlignUnit, needleman_wunsch, variant_analyze
from .msa import SeqAlign
