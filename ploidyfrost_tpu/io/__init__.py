from .fastx import read_batches, iter_sequences
