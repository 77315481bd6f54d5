"""Traditional→Simplified Chinese conversion (X4's hanziconv slot).

The reference tokenizer runs ``HanziConv.toSimplified`` over every line
before segmentation (rag/nlp/rag_tokenizer.py:103-104,262). hanziconv's
full one-char table ships with that package (derived from the public
Unihan kSimplifiedVariant data) and is NOT vendored in the reference
repo, so this module provides the same *machinery* — single-pass
``str.translate`` over a char→char table — with two table sources:

- :data:`TRADI2SIMP_FIXTURE`: a pinned, curated table of common
  unambiguous traditional→simplified pairs (coverage: frequent chars in
  web/legal/technical text). Partial BY DESIGN — chars outside the table
  pass through unchanged, which is also hanziconv's behaviour for
  untabled chars.
- :func:`load_table`: accepts hanziconv's own ``charmap``-style pair
  string or a two-column TSV, so deployments with the real asset get
  byte parity by dropping the file in — the same pluggable-asset pattern
  as the huqie dictionary (X5).
"""

from __future__ import annotations

# curated common pairs (traditional -> simplified); sources: general
# CJK knowledge of the standard GB simplifications — each pair is a
# well-known unambiguous mapping
_PAIRS = (
    "東东 馬马 鳥鸟 龍龙 車车 門门 風风 飛飞 雲云 電电 "
    "書书 畫画 語语 話话 說说 讀读 寫写 聽听 請请 謝谢 "
    "學学 習习 師师 國国 園园 圖图 團团 員员 圓圆 買买 "
    "賣卖 貝贝 財财 貨货 貴贵 費费 資资 賞赏 質质 購购 "
    "長长 張张 開开 關关 問问 間间 聞闻 簡简 萬万 億亿 "
    "計计 記记 認认 識识 論论 議议 訓训 設设 訪访 評评 "
    "辦办 協协 華华 單单 戰战 勝胜 勞劳 動动 務务 勢势 "
    "愛爱 惡恶 憂忧 慶庆 應应 懷怀 態态 總总 聰聪 腦脑 "
    "頭头 頁页 題题 顏颜 願愿 類类 顯显 風风 飯饭 飲饮 "
    "館馆 養养 餘余 駕驾 驗验 驚惊 體体 髮发 鬥斗 魚鱼 "
    "鮮鲜 點点 黨党 齊齐 齒齿 廠厂 廣广 慮虑 產产 畢毕 "
    "異异 當当 發发 盡尽 監监 盤盘 確确 礎础 禮礼 種种 "
    "稱称 積积 窮穷 競竞 筆笔 節节 範范 築筑 粒粒 紅红 "
    "級级 紙纸 細细 終终 組组 結结 統统 經经 綠绿 網网 "
    "線线 編编 緣缘 縣县 總总 繁繁 續续 職职 聯联 聲声 "
    "與与 興兴 舊旧 藝艺 藥药 蘇苏 蟲虫 術术 衛卫 見见 "
    "規规 視视 覺觉 觀观 角角 訂订 讓让 豐丰 貫贯 轉转 "
    "輕轻 輪轮 輸输 農农 遠远 適适 選选 遺遗 鄉乡 醫医 "
    "釋释 金金 針针 鐵铁 銀银 錢钱 錄录 鏡镜 鐘钟 閱阅 "
    "陽阳 陰阴 際际 隨随 險险 隱隐 雖虽 雙双 難难 雞鸡 "
    "靈灵 靜静 麵面 鹽盐 數数 樣样 標标 樂乐 機机 權权 "
    "橫横 檢检 條条 來来 極极 構构 槍枪 業业 榮荣 樓楼 "
    "歲岁 歷历 歸归 殘残 殺杀 毆殴 氣气 漢汉 滅灭 滿满 "
    "漲涨 潔洁 濟济 濃浓 灣湾 無无 煩烦 熱热 燈灯 爲为 "
    "爭争 爺爷 牆墙 獨独 獲获 現现 環环 電电 療疗 發发 "
    "皚皑 強强 彈弹 彙汇 從从 復复 徵征 後后 衆众 微微 "
    "實实 寬宽 審审 寫写 寶宝 對对 導导 將将 專专 尋寻 "
    "幾几 庫库 廢废 廳厅 異异 彌弥 彎弯 歸归 録录 鏈链 "
    "這这 進进 連连 週周 運运 過过 達达 違违 遲迟 鄰邻 "
    "釘钉 銷销 鎖锁 錯错 鍵键 鋼钢 鋪铺 頻频 順顺 項项 "
    "須须 預预 領领 頂顶 絡络 兩两 並并 處处 爾尔 麗丽 勵励 臨临 "
    "舉举 優优 償偿 儲储 兒儿 內内 剛刚 創创 劃划 則则 區区 場场 "
    "壓压 壞坏 壢坜 夢梦 夾夹 奮奋 婦妇 媽妈 孫孙 寧宁 層层 屬属 "
    "島岛 峽峡 帶带 幫帮 幹干 廟庙 建建 強强 彆别 響响 顧顾 餐餐"
)


def _build_fixture() -> dict[int, str]:
    table: dict[int, str] = {}
    for pair in _PAIRS.split():
        if len(pair) != 2:
            continue
        tradi, simp = pair[0], pair[1]
        if tradi != simp:
            table[ord(tradi)] = simp
    return table


TRADI2SIMP_FIXTURE = _build_fixture()


def load_table(path: str) -> dict[int, str]:
    """Load a full conversion table: either hanziconv's charmap module
    format (two aligned strings ``traditional_charmap`` /
    ``simplified_charmap``) or a two-column TSV of (traditional,
    simplified) pairs."""
    text = open(path, encoding="utf-8").read()
    if "traditional_charmap" in text:
        ns: dict = {}
        exec(compile(text, path, "exec"), ns)  # hanziconv charmap module
        tr, si = ns["traditional_charmap"], ns["simplified_charmap"]
        return {ord(a): b for a, b in zip(tr, si) if a != b}
    table: dict[int, str] = {}
    for ln in text.splitlines():
        cols = ln.split("\t")
        if len(cols) >= 2 and len(cols[0]) == 1 and len(cols[1]) >= 1:
            table[ord(cols[0])] = cols[1][0]
    return table


def to_simplified(line: str, table: dict[int, str] | None = None) -> str:
    """``HanziConv.toSimplified`` (rag_tokenizer.py:103-104): per-char
    translate; untabled chars pass through."""
    return line.translate(TRADI2SIMP_FIXTURE if table is None else table)
