"""Runnable entry points (each is also a console demo — see each module's
docstring). Packaged so the pyproject console scripts resolve on install."""
