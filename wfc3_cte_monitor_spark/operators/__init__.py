from .bins import FLUX_BINS, bin_fanout, binspec_df
from .pairs import matching_lookup, pair_self_join, rank_pairing
from .regression import linregress_agg
from .sessionize import find_epochs_pairwise, sessionize
from .sigma_clip import sigma_clip

__all__ = [
    "FLUX_BINS",
    "bin_fanout",
    "binspec_df",
    "find_epochs_pairwise",
    "linregress_agg",
    "matching_lookup",
    "pair_self_join",
    "rank_pairing",
    "sessionize",
    "sigma_clip",
]
