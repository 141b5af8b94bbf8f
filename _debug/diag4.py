import jax
jax.config.update("jax_enable_x64", True)
exec(open('/root/repo/_debug/repro_global.py').read())
