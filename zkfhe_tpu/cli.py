"""CLI driver: mock / keygen / prove / verify.

Mirrors the reference's interface (README.md:19-54 /
halo2-scaffold `Cli`+`run_eth`, SURVEY.md §2.2):

    python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv.in mock
    python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv_empty.in keygen
    python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv.in prove
    python -m zkfhe_tpu --name bfv -k 13 --input bfv/bfv_empty.in verify

Artifact layout matches the reference's store (SURVEY.md §5):
configs/{name}.json, params/kzg_bn254_{k}.npz, data/{name}.pk,
data/{name}.vk, data/{name}.snark. BFV scheme constants are CLI flags
(the reference pins them at compile time, examples/bfv.rs:27-30) and are
recorded in the config at keygen.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _stage(name, t0):
    dt = time.time() - t0
    print(f"[zkfhe] {name}: {dt:.3f}s", flush=True)
    return time.time()


def build_parser():
    p = argparse.ArgumentParser(prog="zkfhe_tpu")
    p.add_argument("--name", required=True, help="circuit artifact name")
    p.add_argument("-k", "--degree", type=int, default=13,
                   help="log2 of the number of rows")
    p.add_argument("--input", required=True,
                   help="input JSON path relative to data/")
    p.add_argument("--config-path", default="configs")
    p.add_argument("--data-path", default="data")
    p.add_argument("--params-path", default="params")
    p.add_argument("--n", type=int, default=1024, help="BFV ring degree N")
    p.add_argument("--q", type=int, default=536870909, help="BFV modulus Q")
    p.add_argument("--t", type=int, default=7, help="BFV plaintext modulus T")
    p.add_argument("--b", type=int, default=19, help="BFV noise bound B")
    p.add_argument("command", choices=["mock", "keygen", "prove", "verify"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    # lazy heavy imports (keep --help fast)
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/zkfhe_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    import jax.numpy as jnp
    from .models import bfv
    from .ops import field as F
    from .trace import compile as TC
    from .backend import keygen as KG
    from .backend import prover as PV
    from .backend import srs as SRS
    from .backend import verifier as VF
    import numpy as np

    t0 = time.time()
    params = bfv.BfvParams(n=args.n, q=args.q, t=args.t, b=args.b)
    cfg_file = os.path.join(args.config_path, f"{args.name}.json")
    if args.command in ("prove", "verify", "mock") and os.path.exists(cfg_file):
        with open(cfg_file) as f:
            cfg = json.load(f)
        bp = cfg.get("bfv_params")
        if bp:
            params = bfv.BfvParams(**bp)

    cin = bfv.CircuitInput.from_json(os.path.join(args.data_path, args.input))
    inputs = cin.to_arrays(params)
    circuit = bfv.make_bfv_circuit(params)
    t0 = _stage("load input + build circuit", t0)

    if args.command == "mock":
        layout = TC.trace_layout(circuit, inputs)
        t0 = _stage("trace layout", t0)
        gamma = jnp.asarray(F.encode(F.FR, [0x6D6F636B]))[:, 0]
        witgen = TC.make_witgen(circuit)
        values, instance = witgen(inputs, gamma)
        jax.block_until_ready(values)
        t0 = _stage("witness generation (jit+run)", t0)
        res = TC.mock_check(layout, values, gamma)
        nbad = sum(len(v) for v in res.values())
        t0 = _stage("constraint evaluation", t0)
        if nbad:
            print(f"[zkfhe] MOCK FAILED: {nbad} violations")
            return 1
        print(f"[zkfhe] mock OK: {sum(layout.sizes)} cells, "
              f"{layout.num_instance} public values")
        return 0

    srs = SRS.load_or_generate(args.degree, args.params_path)
    t0 = _stage("srs", t0)

    vk_path = os.path.join(args.data_path, f"{args.name}.vk.npz")
    pk_path = os.path.join(args.data_path, f"{args.name}.pk.npz")
    snark_path = os.path.join(args.data_path, f"{args.name}.snark.npz")

    if args.command == "keygen":
        pk = KG.keygen(circuit, inputs, args.degree, srs)
        t0 = _stage("keygen", t0)
        os.makedirs(args.config_path, exist_ok=True)
        cfg = pk.asm.config_json()
        cfg["bfv_params"] = {"n": params.n, "q": params.q,
                             "t": params.t, "b": params.b}
        with open(cfg_file, "w") as f:
            json.dump(cfg, f, indent=1)
        KG.save_vk(pk.vk, vk_path)
        KG.save_pk(pk, pk_path)
        _stage("write artifacts", t0)
        print(f"[zkfhe] keygen OK -> {cfg_file}, {vk_path}, {pk_path}")
        return 0

    if args.command == "prove":
        vk = KG.load_vk(vk_path)
        pk = KG.load_pk(pk_path, vk, circuit, inputs)
        t0 = _stage("load pk", t0)
        proof = PV.prove(pk, srs, circuit, inputs)
        t0 = _stage("prove", t0)
        gamma0 = jnp.zeros((F.NLIMBS,), dtype=jnp.uint32)
        _, instance = TC.make_witgen(circuit)(inputs, gamma0)
        inst = F.decode(F.FR, instance)
        np.savez_compressed(
            snark_path, proof=np.frombuffer(proof, dtype=np.uint8),
            instance=np.asarray([str(v) for v in inst]),
        )
        _stage("write proof", t0)
        print(f"[zkfhe] prove OK -> {snark_path} ({len(proof)} bytes)")
        return 0

    if args.command == "verify":
        vk = KG.load_vk(vk_path)
        data = np.load(snark_path, allow_pickle=True)
        proof = bytes(data["proof"])
        inst = [int(v) for v in data["instance"]]
        t0 = _stage("load vk + proof", t0)
        ok = VF.verify(vk, proof, inst, verbose=True)
        _stage("verify", t0)
        print(f"[zkfhe] verify: {'OK' if ok else 'FAILED'}")
        return 0 if ok else 1

    return 1


if __name__ == "__main__":
    sys.exit(main())
