from physdock_tpu.train.step import TrainState, make_train_step  # noqa: F401
