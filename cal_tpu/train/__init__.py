from cal_tpu.train.losses import causal_losses, nll_loss
from cal_tpu.train.optim import make_optimizer, cosine_lr
from cal_tpu.train.causal import train_causal_syn, train_causal_real
from cal_tpu.train.baseline import train_baseline_syn
