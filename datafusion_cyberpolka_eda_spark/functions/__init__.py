from datafusion_cyberpolka_eda_spark.functions.sampling import hash_sample, key_mod_sample

__all__ = ["hash_sample", "key_mod_sample"]
