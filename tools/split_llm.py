"""One-shot refactor script (r9 verdict task 6): split registry/llm.py
into family modules (llm_base / llm_multimodal / llm_similarity /
llm_incremental + the text/dedup remainder in llm.py) with a re-export
facade so every existing `from ...registry.llm import X` keeps working.
Zero behavior change by construction: blocks move verbatim (comments
attached), cross-module references become explicit imports, and the
facade aliases every moved name back into llm's namespace."""

from __future__ import annotations

import ast
import sys

LLM = "datafusion_cyberpolka_eda_spark/registry/llm.py"

FAMILY = {
    "llm_base": [
        "_table_fingerprint", "_docs_fingerprint", "_doc_gram_hashes",
    ],
    "llm_multimodal": [
        "_MULTIMODAL_ORACLE", "l9_multimodal_features",
        "l9b_multimodal_ppm_decode", "l9c_multimodal_frame_sample",
        "l9d_multimodal_wav_decode", "l9e_multimodal_resize",
        "_L58_CTES", "_L58_ORACLE", "l58_image_phash_neardup",
        "_L61_ORACLE", "l61_image_dedup_pipeline",
        "_L62_CTES", "_L62_ORACLE", "l62_audio_fingerprint_neardup",
        "_L63_ORACLE", "l63_audio_dedup_pipeline",
        "_MM_FP_STORE_CACHE", "_mm_fp_store", "_mm_incremental_oracle",
        "l66_incremental_image_neardup", "l67_incremental_audio_neardup",
    ],
    "llm_similarity": [
        "_COSINE_TOPK_ORACLE", "l7_cosine_topk", "l8_ann_lsh_neighbors",
        "l10_embedding_neardup", "l8b_ann_ivf_neighbors",
        "l8c_ann_recall_bound", "l8d_ann_lsh_portable",
        "_ANN_TRUTH_CACHE", "_ann_exact_top5",
        "l16_embedding_quantize_int8", "l8e_ann_ivf_pq",
        "_IVF_STORE_CACHE", "_ivf_pq_store", "l8f_ann_ivf_pq_incremental",
        "l8g_ann_ivf_pq_takedown", "l8h_ann_ivf_pq_rotated",
        "_SEM_STORE_CACHE", "_semantic_store", "_L41_ORACLE",
        "l41_incremental_embedding_dedup",
        "GRAM_QSCALE", "embedding_gram_partials", "l46_embedding_covariance",
        "_GRAM_STORE_CACHE", "_gram_store", "l51_incremental_covariance",
        "l48_sparse_cosine_pairs", "l57_semantic_drift",
        "_l59_oracle", "l59_distributed_kmeans",
        "_L60_ORACLE", "l60_semantic_decontamination",
        "SEMDEDUP_TWIN_OFFSET", "_l65_oracle", "l65_semdedup",
        "_L68_CTES", "_L68_ORACLE", "l68_knn_join",
        "_L68B_ORACLE", "l68b_knn_join_recall",
    ],
    "llm_incremental": [
        "_INCR_STORE_CACHE", "_incremental_store", "_l31_oracle",
        "l31_incremental_dedup",
        "_INCR_CC_CACHE", "_incremental_cc_store", "_l33_oracle",
        "l33_incremental_components",
        "_INCR_SURV_CACHE", "_pick_survivors", "_incremental_surv_store",
        "_l34_oracle", "l34_incremental_survivors",
        "_MIXTURE_STORE_CACHE", "_mixture_store",
        "l36_incremental_mixture_refresh", "l35_cluster_safe_split",
        "_l37_oracle", "l37_incremental_pipeline",
        "_DECON_STORE_CACHE", "_L32_CUTOFF_FRAC", "_decon_store",
        "_L32_ORACLE", "l32_incremental_decontamination",
        "_l38_oracle", "l38_takedown_propagation",
        "_L39_ORACLE", "psi_feature_buckets", "psi_from_counts",
        "l39_psi_drift",
        "_l40_oracle", "_takedown_ledger_rows", "l40_takedown_pipeline",
    ],
}

MODULE_DOC = {
    "llm_base": '"""Shared substrate for the L-family registry modules: '
    "data fingerprints (store-memo invalidation keys) and the document "
    'gram hashing both the batch and incremental decontamination screens use."""',
    "llm_multimodal": '"""L-family multimodal entries: PPM/WAV codec '
    "demos, perceptual image/audio fingerprint dedup (l58/l61/l62/l63) "
    'and the incremental fingerprint stores (l66/l67). Split from llm.py (r10)."""',
    "llm_similarity": '"""L-family embedding/ANN entries: brute-force and '
    "banded cosine search, IVF-PQ index lifecycle, covariance/drift, "
    "distributed k-means, semantic decontamination, SemDeDup, and the "
    'batch k-NN join. Split from llm.py (r10)."""',
    "llm_incremental": '"""L-family incremental/daily-pipeline entries: '
    "persisted-store dedup, component/survivor maintenance, mixture "
    "refresh, decontamination, takedown propagation, and PSI drift. "
    'Split from llm.py (r10)."""',
}

ORDER = ["llm_base", "llm_multimodal", "llm_similarity", "llm_incremental"]


def main() -> int:
    src = open(LLM).read()
    lines = src.split("\n")
    tree = ast.parse(src)

    # header = leading docstring + import run
    body = tree.body
    i = 0
    while i < len(body) and isinstance(
        body[i], (ast.Import, ast.ImportFrom)
    ) or (
        i < len(body)
        and isinstance(body[i], ast.Expr)
        and isinstance(body[i].value, ast.Constant)
    ):
        i += 1
    header_end = body[i - 1].end_lineno  # 1-based inclusive
    stmts = body[i:]

    def primary_name(node):
        if isinstance(node, ast.FunctionDef):
            return node.name
        if isinstance(node, ast.Assign) and isinstance(
            node.targets[0], ast.Name
        ):
            return node.targets[0].id
        if isinstance(node, ast.AnnAssign) and isinstance(
            node.target, ast.Name
        ):
            return node.target.id
        return None

    name_to_mod = {}
    for mod, names in FAMILY.items():
        for n in names:
            assert n not in name_to_mod, n
            name_to_mod[n] = mod

    # blocks: (module, name, text)
    blocks = []
    prev_end = header_end
    cur_mod = "llm"  # unnamed blocks stick to the previous named block's module
    for node in stmts:
        start = min(
            [node.lineno]
            + [d.lineno for d in getattr(node, "decorator_list", [])]
        )
        text = "\n".join(lines[prev_end : node.end_lineno])  # incl comments
        nm = primary_name(node)
        mod = name_to_mod.get(nm, cur_mod if nm is None else "llm")
        if nm is not None:
            cur_mod = mod
        blocks.append((mod, nm, text))
        prev_end = node.end_lineno

    all_names = {nm for _, nm, _ in blocks if nm}
    defined_in = {}
    for mod, nm, _ in blocks:
        if nm:
            defined_in.setdefault(nm, mod)

    # per-module referenced llm-level names (walk each block's AST)
    def refs_of(text):
        t = ast.parse(text.lstrip("\n") or "pass")
        out = set()
        for sub in ast.walk(t):
            if isinstance(sub, ast.Name) and sub.id in all_names:
                out.add(sub.id)
        return out

    mod_defines = {m: set() for m in ORDER + ["llm"]}
    mod_refs = {m: set() for m in ORDER + ["llm"]}
    for mod, nm, text in blocks:
        if nm:
            mod_defines[mod].add(nm)
        mod_refs[mod] |= refs_of(text)

    mod_imports = {m: {} for m in ORDER + ["llm"]}  # mod -> {src_mod: [names]}
    topo = {m: k for k, m in enumerate(ORDER + ["llm"])}
    for mod in ORDER + ["llm"]:
        need = mod_refs[mod] - mod_defines[mod]
        for n in sorted(need):
            src_mod = defined_in[n]
            if topo[src_mod] >= topo[mod]:
                print(
                    f"CYCLE: {mod} needs {n} from {src_mod} "
                    f"(not earlier in topo order)"
                )
                return 1
            mod_imports[mod].setdefault(src_mod, []).append(n)

    header = "\n".join(lines[:header_end])

    for mod in ORDER:
        out = [MODULE_DOC[mod], ""]
        # reuse the original import header minus the module docstring
        hdr_lines = header.split("\n")
        # drop the original docstring (first expr) — find first import line
        k = 0
        while k < len(hdr_lines) and not hdr_lines[k].startswith(
            ("import ", "from ")
        ):
            k += 1
        out.append("\n".join(hdr_lines[k:]))
        for src_mod, names in sorted(mod_imports[mod].items()):
            out.append(
                f"from datafusion_cyberpolka_eda_spark.registry.{src_mod} "
                f"import (  # noqa: F401\n    "
                + ",\n    ".join(sorted(names))
                + ",\n)"
            )
        out.append("")
        for bmod, nm, text in blocks:
            if bmod == mod:
                out.append(text)
        open(
            f"datafusion_cyberpolka_eda_spark/registry/{mod}.py", "w"
        ).write("\n".join(out) + "\n")
        print(f"wrote {mod}.py: {len(mod_defines[mod])} names")

    # rebuilt llm.py: header + family imports + remainder blocks + facade
    out = [header]
    for src_mod, names in sorted(mod_imports["llm"].items()):
        out.append(
            f"from datafusion_cyberpolka_eda_spark.registry.{src_mod} "
            f"import (  # noqa: F401\n    "
            + ",\n    ".join(sorted(names))
            + ",\n)"
        )
    for bmod, nm, text in blocks:
        if bmod == "llm":
            out.append(text)
    # facade: every moved name importable from llm unchanged
    out.append(
        "\n\n# ---- re-export facade (r10 split): every name that moved to a"
        "\n# family module stays importable from registry.llm so external"
        "\n# importers (registry/events.py, streaming, tests, tools) are"
        "\n# untouched. Aliases share the SAME objects (store caches are"
        "\n# mutated in place), so cache clearing stays consistent. ----"
    )
    for mod in ORDER:
        already = set()
        for names in mod_imports["llm"].values():
            already |= set(names)
        names = sorted(mod_defines[mod] - already)
        if names:
            out.append(
                f"from datafusion_cyberpolka_eda_spark.registry.{mod} "
                f"import (  # noqa: F401,E402\n    "
                + ",\n    ".join(names)
                + ",\n)"
            )
    open(LLM, "w").write("\n".join(out) + "\n")
    print(f"rewrote llm.py: {len(mod_defines['llm'])} names kept")
    return 0


if __name__ == "__main__":
    sys.exit(main())
