from spurfies_tpu.train.trainer import Trainer, make_train_step
