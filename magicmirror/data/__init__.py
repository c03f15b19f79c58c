from .cub import CUBDataset
from .market import MarketDataset
from .atr import ATRDataset
from .atr2 import ATR2Dataset
from .thuman2 import THuman2Dataset
from .loader import DataLoader
