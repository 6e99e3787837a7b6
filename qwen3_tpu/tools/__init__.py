"""Debug/smoke CLIs mirroring the reference's examples/ drivers
(examples/model.c:8-29 load-check, examples/tokenizer.c:12-52 encode
round-trip printer)."""
