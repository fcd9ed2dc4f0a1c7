"""Related-caption k-NN augmentation over embedding banks.

Capability parity with
``/root/reference/data_handing/embeddings_related_generator.py`` (single
input) and ``_wavcaps.py`` (multi-file input): build the unique normalized
text-embedding matrix, attach each record's top-k cosine neighbors as
``related_embeddings``, stream-append pickle records (the EOFError format
the datasets read).

TPU-first: the reference loops item-by-item with a full-bank cosine per
item (``:20-29``); here queries are batched and the scan is one device
matmul + ``jax.lax.top_k`` per batch.

Run: ``python -m zs_aac_tpu.pipeline.related --input_path a.pkl b.pkl
--output_path out.pkl --topnumber 5``
"""

from __future__ import annotations

import argparse
from typing import List, Sequence, Tuple

import numpy as np

from zs_aac_tpu.data.banks import read_bank, write_bank_stream

__all__ = ["load_unique_text_embeddings", "attach_related", "main"]


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def load_unique_text_embeddings(paths: Sequence[str]) -> Tuple[np.ndarray, List[dict]]:
    """Concatenate banks; dedupe text embeddings (the reference's
    ``set`` of tensors, ``:14-16``) by byte content."""
    all_data: List[dict] = []
    for p in paths:
        all_data.extend(read_bank(p))
    seen = {}
    for rec in all_data:
        e = np.asarray(rec["text_embedding"], np.float32).reshape(1, -1)
        seen.setdefault(e.tobytes(), e)
    unique = np.concatenate(list(seen.values()), axis=0)
    return _normalize(unique), all_data


def attach_related(
    bank: np.ndarray,              # [N, E] normalized unique embeddings
    records: List[dict],
    topnumber: int = 5,
    batch: int = 256,
    device: bool = True,
):
    """Yield records with ``related_embeddings`` [k, E] attached."""
    if device:
        import jax
        import jax.numpy as jnp

        n_valid = bank.shape[0]
        n_dev = len(jax.devices())
        if n_dev > 1 and n_valid >= n_dev:
            # Shard the bank rows over the device mesh; queries replicate.
            # XLA turns the top-k over the sharded similarity axis into
            # local top-ks + a gather — the multichip bank scan.
            from jax.sharding import NamedSharding, PartitionSpec as P

            from zs_aac_tpu.parallel.mesh import make_mesh

            mesh = make_mesh()
            pad = (-n_valid) % n_dev
            bank_d = jax.device_put(
                jnp.asarray(np.pad(bank, ((0, pad), (0, 0)))),
                NamedSharding(mesh, P("data")),
            )
        else:
            bank_d = jnp.asarray(bank)

        @jax.jit
        def _topk(q, bank_arr):  # bank as an argument, never a jit constant
            sims = q @ bank_arr.T
            # padded rows can never win
            col = jnp.arange(bank_arr.shape[0])
            sims = jnp.where(col[None, :] < n_valid, sims, -jnp.inf)
            _, idx = jax.lax.top_k(sims, topnumber)
            return idx

        def topk(q):
            return _topk(q, bank_d)

    for s in range(0, len(records), batch):
        chunk = records[s : s + batch]
        q = _normalize(
            np.concatenate(
                [np.asarray(r["text_embedding"], np.float32).reshape(1, -1)
                 for r in chunk]
            )
        )
        if device:
            idx = np.asarray(topk(jnp.asarray(q)))
        else:
            idx = np.argsort(-(q @ bank.T), axis=1)[:, :topnumber]
        for r, ids in zip(chunk, idx):
            out = dict(r)
            out["related_embeddings"] = bank[ids]
            yield out


def main(argv=None):
    from zs_aac_tpu.utils.compile_cache import enable_persistent_cache
    enable_persistent_cache()  # cross-CLI compile reuse (VERDICT r4 #5)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_path", nargs="+", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--topnumber", type=int, default=5)
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args(argv)

    bank, records = load_unique_text_embeddings(args.input_path)
    n = write_bank_stream(
        args.output_path,
        attach_related(bank, records, args.topnumber, args.batch),
        append=True,  # reference opens 'ab' (:33)
    )
    print(f"wrote {n} records -> {args.output_path}")


if __name__ == "__main__":
    main()
