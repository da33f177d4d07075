from esvo_tpu.eval.trajectory import (
    ate_rmse,
    rpe_stats,
    umeyama_alignment,
    save_tum,
    load_tum,
)

__all__ = ["ate_rmse", "rpe_stats", "umeyama_alignment", "save_tum",
           "load_tum"]
