"""Device kernels (SURVEY.md L2 hot loops): Pallas VMEM decoders, XLA lane decoder, MXU CRC."""
