from mrisr_tpu.train.state import TrainState, create_train_state, make_lr_schedule

__all__ = ["TrainState", "create_train_state", "make_lr_schedule"]
