"""Measure the reference-stack stand-in: Inception-v3 training throughput in
PyTorch on this host (CPU — no GPU/torchvision in this environment).

The reference (WHOIGit/ifcb_classifier) publishes no benchmark numbers
(BASELINE.md); its stack is torch+torchvision inception_v3 @299. This script
reconstructs the same architecture in pure torch (same layer graph as
torchvision's Inception3, aux head included, verified by parameter count) and
times the same training step (Adam lr=1e-3, CE + 0.4*aux CE, batch from the
reference's default 108) — producing the anchor recorded in
BENCH_BASELINE.json that bench.py's vs_baseline divides by.

Run: python tools/bench_baseline_torch.py [--batch 108] [--iters 3]
"""

import argparse
import json
import os
import time

import torch
import torch.nn as nn


class BasicConv2d(nn.Module):
    def __init__(self, i, o, **kw):
        super().__init__()
        self.conv = nn.Conv2d(i, o, bias=False, **kw)
        self.bn = nn.BatchNorm2d(o, eps=0.001)

    def forward(self, x):
        return torch.relu(self.bn(self.conv(x)))


class InceptionA(nn.Module):
    def __init__(self, i, pool):
        super().__init__()
        self.b1 = BasicConv2d(i, 64, kernel_size=1)
        self.b5_1 = BasicConv2d(i, 48, kernel_size=1)
        self.b5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.b3_1 = BasicConv2d(i, 64, kernel_size=1)
        self.b3_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.b3_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.bp = BasicConv2d(i, pool, kernel_size=1)

    def forward(self, x):
        p = torch.nn.functional.avg_pool2d(x, 3, 1, 1)
        return torch.cat([self.b1(x), self.b5_2(self.b5_1(x)),
                          self.b3_3(self.b3_2(self.b3_1(x))), self.bp(p)], 1)


class InceptionB(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.b3 = BasicConv2d(i, 384, kernel_size=3, stride=2)
        self.bd_1 = BasicConv2d(i, 64, kernel_size=1)
        self.bd_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.bd_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([self.b3(x), self.bd_3(self.bd_2(self.bd_1(x))),
                          torch.nn.functional.max_pool2d(x, 3, 2)], 1)


class InceptionC(nn.Module):
    def __init__(self, i, c7):
        super().__init__()
        self.b1 = BasicConv2d(i, 192, kernel_size=1)
        self.b7_1 = BasicConv2d(i, c7, kernel_size=1)
        self.b7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.b7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.bd_1 = BasicConv2d(i, c7, kernel_size=1)
        self.bd_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.bd_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.bd_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.bd_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.bp = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        p = torch.nn.functional.avg_pool2d(x, 3, 1, 1)
        return torch.cat([self.b1(x), self.b7_3(self.b7_2(self.b7_1(x))),
                          self.bd_5(self.bd_4(self.bd_3(self.bd_2(self.bd_1(x))))),
                          self.bp(p)], 1)


class InceptionD(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.b3_1 = BasicConv2d(i, 192, kernel_size=1)
        self.b3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.b7_1 = BasicConv2d(i, 192, kernel_size=1)
        self.b7_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.b7_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.b7_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

    def forward(self, x):
        return torch.cat([self.b3_2(self.b3_1(x)),
                          self.b7_4(self.b7_3(self.b7_2(self.b7_1(x)))),
                          torch.nn.functional.max_pool2d(x, 3, 2)], 1)


class InceptionE(nn.Module):
    def __init__(self, i):
        super().__init__()
        self.b1 = BasicConv2d(i, 320, kernel_size=1)
        self.b3_1 = BasicConv2d(i, 384, kernel_size=1)
        self.b3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.b3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.bd_1 = BasicConv2d(i, 448, kernel_size=1)
        self.bd_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.bd_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.bd_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.bp = BasicConv2d(i, 192, kernel_size=1)

    def forward(self, x):
        b3 = self.b3_1(x)
        bd = self.bd_2(self.bd_1(x))
        p = torch.nn.functional.avg_pool2d(x, 3, 1, 1)
        return torch.cat([self.b1(x),
                          torch.cat([self.b3_2a(b3), self.b3_2b(b3)], 1),
                          torch.cat([self.bd_3a(bd), self.bd_3b(bd)], 1),
                          self.bp(p)], 1)


class InceptionAux(nn.Module):
    def __init__(self, i, n):
        super().__init__()
        self.conv0 = BasicConv2d(i, 128, kernel_size=1)
        self.conv1 = BasicConv2d(128, 768, kernel_size=5)
        self.fc = nn.Linear(768, n)

    def forward(self, x):
        x = torch.nn.functional.avg_pool2d(x, 5, 3)
        x = self.conv1(self.conv0(x))
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(x)


class Inception3(nn.Module):
    def __init__(self, n=50):
        super().__init__()
        self.s1 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.s2 = BasicConv2d(32, 32, kernel_size=3)
        self.s3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.s4 = BasicConv2d(64, 80, kernel_size=1)
        self.s5 = BasicConv2d(80, 192, kernel_size=3)
        self.m5b = InceptionA(192, 32)
        self.m5c = InceptionA(256, 64)
        self.m5d = InceptionA(288, 64)
        self.m6a = InceptionB(288)
        self.m6b = InceptionC(768, 128)
        self.m6c = InceptionC(768, 160)
        self.m6d = InceptionC(768, 160)
        self.m6e = InceptionC(768, 192)
        self.aux = InceptionAux(768, n)
        self.m7a = InceptionD(768)
        self.m7b = InceptionE(1280)
        self.m7c = InceptionE(2048)
        self.fc = nn.Linear(2048, n)

    def forward(self, x):
        x = self.s3(self.s2(self.s1(x)))
        x = torch.nn.functional.max_pool2d(x, 3, 2)
        x = self.s5(self.s4(x))
        x = torch.nn.functional.max_pool2d(x, 3, 2)
        x = self.m5d(self.m5c(self.m5b(x)))
        x = self.m6e(self.m6d(self.m6c(self.m6b(self.m6a(x)))))
        aux = self.aux(x) if self.training else None
        x = self.m7c(self.m7b(self.m7a(x)))
        x = torch.nn.functional.adaptive_avg_pool2d(x, 1).flatten(1)
        return self.fc(torch.nn.functional.dropout(x, 0.5, self.training)), aux


def _merge_json(out_path: str, updates: dict):
    data = {}
    if os.path.isfile(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data.update(updates)
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", out_path)


def bench_infer(args, model, out_path):
    """Eval-mode forward + softmax — the RUN-path stand-in (the reference's
    test_step, neuston_models.py:152-157) on this host's torch CPU."""
    model.eval()
    x = torch.rand(args.batch, 3, 299, 299)
    with torch.no_grad():
        out, _ = model(x)
        _ = torch.softmax(out, 1)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out, _ = model(x)
            probs = torch.softmax(out, 1)
        _ = float(probs.sum())
        dt = time.perf_counter() - t0
    ips = args.batch * args.iters / dt
    print(f"torch-CPU inception_v3 infer: {ips:.2f} img/s "
          f"({dt / args.iters:.1f}s/iter @ batch {args.batch})")
    _merge_json(out_path, dict(
        infer_imgs_per_sec=round(ips, 2),
        infer_what="inception_v3 @299 eval fwd+softmax, torch CPU "
                   "(reference RUN-path stand-in)",
        infer_batch=args.batch, infer_iters=args.iters))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=108)  # reference default
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--classes", type=int, default=50)
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    args = ap.parse_args()

    torch.manual_seed(0)
    model = Inception3(args.classes)
    n_params = sum(p.numel() for p in model.parameters())
    print(f"params: {n_params:,}")

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_BASELINE.json")
    if args.mode == "infer":
        return bench_infer(args, model, out_path)

    opt = torch.optim.Adam(model.parameters(), lr=0.001)
    crit = nn.CrossEntropyLoss()
    x = torch.rand(args.batch, 3, 299, 299)
    y = torch.randint(0, args.classes, (args.batch,))

    model.train()
    # warmup
    out, aux = model(x)
    loss = crit(out, y) + 0.4 * crit(aux, y)
    loss.backward()
    opt.step()
    opt.zero_grad()

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out, aux = model(x)
        loss = crit(out, y) + 0.4 * crit(aux, y)
        loss.backward()
        opt.step()
        opt.zero_grad()
    dt = time.perf_counter() - t0
    ips = args.batch * args.iters / dt
    print(f"torch-CPU inception_v3 train: {ips:.2f} img/s "
          f"({dt / args.iters:.1f}s/iter @ batch {args.batch})")

    _merge_json(out_path, dict(
        imgs_per_sec=round(ips, 2),
        what="inception_v3 @299 train step, torch 2.13 CPU (reference "
             "stack stand-in; reference GPU + published numbers "
             "unavailable — see BASELINE.md)",
        batch=args.batch, iters=args.iters,
        host_cpus=os.cpu_count(), torch=torch.__version__))


if __name__ == "__main__":
    main()
