from cal_tpu.models.causal import CausalGNN
from cal_tpu.models.baselines import BaselineGNN
from cal_tpu.models.factory import get_model
