from .data_layer import DataLayer
