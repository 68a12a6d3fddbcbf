from physdock_tpu.data.constants import periodic_table, restypes  # noqa: F401
