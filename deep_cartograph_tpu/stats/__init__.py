from deep_cartograph_tpu.stats.descriptors import (
    difference_filter,
    dip_pvalues,
    feature_statistics,
    min_value_filter,
    shannon_entropy,
    standard_deviation,
)
from deep_cartograph_tpu.stats.dip import dip_pvalue, dip_statistic, diptest
