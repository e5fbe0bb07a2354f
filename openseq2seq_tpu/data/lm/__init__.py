from .lmdata import WKTDataLayer, IMDBDataLayer, SSTDataLayer, Corpus
