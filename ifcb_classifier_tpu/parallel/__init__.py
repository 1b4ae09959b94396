"""Device mesh construction and sharding rules (data parallel + head tensor
parallel) — the framework's distributed story, replacing the reference's
`Trainer(gpus=N)` integer (/root/reference/neuston_net.py:101-107)."""
