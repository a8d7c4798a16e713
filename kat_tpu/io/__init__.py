"""Host I/O: FASTA/FASTQ readers (Python + native C++), jellyfish .jf
codec, sharded checkpoints, mme text headers, prefetch pipeline."""
