def __getattr__(name):
    # lazy: fhe_study_tpu.models.bfv / bfv_rns / ckks / tfhe / gfhe
    if name in ("bfv", "bfv_rns", "bfv_noise", "bfv_batch", "ckks", "tfhe",
                "gfhe", "galois", "hybrid_ks"):
        import importlib
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(name)
