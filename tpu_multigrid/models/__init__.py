from . import gauge, operators
