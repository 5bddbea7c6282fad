"""Column-expression libraries: text analysis, hashing/sketches,
ABI-decode pandas UDFs, multimodal plumbing."""
