from . import hierarchy, cycles, driver
