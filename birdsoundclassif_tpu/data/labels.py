"""Label vocabulary tables (data, not code): species-name normalization and
noise/non-bird buckets used by the dataset ETL (reference:
nbm_datasets/utils.py:144-235 — these are curated data tables tied to the
NBM annotation corpus; they must match for dataset-level parity)."""

# typo / synonym normalization applied before id lookup
SPECIES_REPLACEMENTS = {
    "Emberiza ortulana": "Emberiza hortulana",
    "bernicla bernicla": "Branta bernicla",
    "Bernicla bernicla": "Branta bernicla",
    "Grus grus adulte": "Grus grus",
    "Corvus corone alarme": "Corvus corone",
    "Phasianus colchicus ": "Phasianus colchicus",
    "Luscinia megarynchos megarynchos": "Luscinia megarhynchos",
    "Luscinia megarhynchos megarhynchos ": "Luscinia megarhynchos",
    "Luscinia megarhynchos megarhynchos": "Luscinia megarhynchos",
    "Grus grus juvénile": "Grus grus",
    "Strix aluco chant": "Strix aluco",
    "Strix aluco cris": "Strix cris",
    "tachybaptus ruficollis": "Tachybaptus ruficollis",
    "Tachybaptus ruficollis ": "Tachybaptus ruficollis",
    "Burhinus burhinus": "Burhinus oedicnemus",
    "Erithacus rubecula ": "Erithacus rubecula",
    "Turdus merula alarme": "Turdus merula",
    "Luscinia megarhynchos": "Luscinia megarhynchos",
    "Burhinus oedicnemus ": "Burhinus oedicnemus",
    "Gallinula chloropus ": "Gallinula chloropus",
    "chant Luscinia megarhynchos": "Luscinia megarhynchos",
    "Anas platychyncos": "Anas platyrhynchos",
    "Grus grus cris": "Grus grus",
    "Turdus merula cris": "Turdus merula",
    "Turdus philomelos cris": "Turdus philomelos",
    "Turdus iliacus cris": "Turdus iliacus",
    "Erithacus rubecola": "Erithacus rubecula",
    "Anas platyrhynchos ": "Anas platyrhynchos",
    "Certhia brachydactyla ": "Certhia brachydactyla",
    "Streptopelia decaocto ": "Streptopelia decaocto",
    "Strix aluco ": "Strix aluco",
    "Botaurus stellaris ": "Botaurus stellaris",
    "Numenius arquata XC570503": "Numenius arquata",
    "Chevalier sylvain": "Tringa glareola",
    "caprimulgus europaeus": "Caprimulgus europaeus",
    "ardea cinerea": "Ardea cinerea",
    "Cuculus canorus canorus": "Cuculus canorus",
    "Charadrius dubius curonicus": "Charadrius dubius",
    "Charadrius curonicus": "Charadrius dubius",
    "Erithacus rubecula rubecula": "Erithacus rubecula",
    "Tyto alba alba": "Tyto alba",
    "Ardea nycticorax": "Nycticorax nycticorax",
    "Carduelis carduelis ": "Carduelis carduelis",
}

# background / noise -> id -1 (negative RPN samples, never detected)
NOISE_LABELS = [
    "Bruit de fond", "Background", "Backgroud", "passage moto au loin",
    "Back ground", "Back groung", "Backgroun", "Bakground", "backgroound",
    "background", "bruit de fond",
]

# non-bird signal -> id 0 (detected but classified as background class)
NOT_BIRD_LABELS = [
    "Capreolus capreolus", "Pelophylax sp.", "Vulpes vulpes",
    "Oecanthus pellucens", "ruspolia nitidula", "orthoptère", "voix humaine",
    "saturation HF par orthoptères", "Cervus elaphus brame", "Sus scrofa",
    "chien", "Hannetons par milliers", "possible battement d'aile", "What ??",
    "parasite", "bruit parasite", "geophonie", "Vent geophonie",
    "vulpes vulpes", "Capreolus capreolus ", "0: Bruit parasite",
    "0: Other biophonia", "0: Other antropophonia", "0: Other geophonia",
    "0: Background", "1: Autre biophonie", "1: Autre antropophonie",
    "0: Unknown", "Inconnu",
]

# unidentified species excluded when suppress_unID
UNIDENTIFIED = ["Oiseau sp", "Parus sp"]
